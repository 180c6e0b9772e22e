"""Numeric parity tests for core ops against the PyTorch reference.

Each test generates random inputs, runs our jnp op and the corresponding
reference torch module (imported in place from /root/reference, never
copied), and compares outputs to float32 tolerance.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from nerfmeshes_tpu.ops import (
    cumprod_exclusive,
    get_ray_bundle,
    hierarchical_intervals,
    intervals_to_ray_points,
    mse2psnr,
    ndc_rays,
    positional_encoding,
    positional_encoding_output_size,
    ray_sample_interval,
    sample_pdf,
    volume_render,
)

from refload import ref_modules, ref_nerf_helpers, ref_model_helpers


def to_np(x):
    return np.asarray(x)


class SimpleNS:
    """Tiny attribute bag standing in for a cfg node in reference calls."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def test_cumprod_exclusive(rng):
    x = rng.uniform(0.1, 1.0, size=(4, 7)).astype(np.float32)
    expected = np.ones_like(x)
    expected[:, 1:] = np.cumprod(x, axis=-1)[:, :-1]
    np.testing.assert_allclose(to_np(cumprod_exclusive(jnp.asarray(x))), expected, rtol=1e-6)


@pytest.mark.parametrize("log_sampling", [True, False])
@pytest.mark.parametrize("include_input", [True, False])
@pytest.mark.parametrize("num_fn", [4, 10])
def test_positional_encoding_parity(rng, log_sampling, include_input, num_fn):
    m = ref_modules()
    x = rng.standard_normal((5, 3)).astype(np.float32)
    ref = m.PositionalEncoding(num_fn, include_input, log_sampling)
    expected = ref(torch.from_numpy(x)).numpy()
    got = to_np(positional_encoding(jnp.asarray(x), num_fn, include_input, log_sampling))
    assert got.shape[-1] == positional_encoding_output_size(num_fn, include_input)
    # atol covers float32 ulp amplification of sin/cos at |freq*x| ~ 2^9.
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=2e-4)


@pytest.mark.parametrize("lindisp", [False, True])
@pytest.mark.parametrize("per_ray", [False, True])
def test_ray_sample_interval_parity(rng, lindisp, per_ray):
    m = ref_modules()
    R, S = 6, 16
    if per_ray:
        near = rng.uniform(1.0, 2.0, size=(R,)).astype(np.float32)
        far = rng.uniform(4.0, 6.0, size=(R,)).astype(np.float32)
        t_near, t_far = torch.from_numpy(near), torch.from_numpy(far)
    else:
        near, far = 2.0, 6.0
        t_near, t_far = torch.tensor(near), torch.tensor(far)

    sampler = m.RaySampleInterval(S)
    cfg = SimpleNS(lindisp=lindisp, perturb=False)
    expected = sampler(cfg, R, t_near, t_far).numpy()
    got = to_np(ray_sample_interval(S, R, near, far, lindisp=lindisp, perturb=False))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_ray_sample_interval_perturb_bounds():
    S, R = 32, 8
    base = to_np(ray_sample_interval(S, R, 2.0, 6.0))
    key = jax.random.key(0)
    jittered = to_np(ray_sample_interval(S, R, 2.0, 6.0, perturb=True, key=key))
    mids = 0.5 * (base[..., 1:] + base[..., :-1])
    upper = np.concatenate([mids, base[..., -1:]], -1)
    lower = np.concatenate([base[..., :1], mids], -1)
    assert (jittered >= lower - 1e-6).all() and (jittered <= upper + 1e-6).all()
    # Perturbed samples stay sorted because bins don't overlap.
    assert (np.diff(jittered, axis=-1) >= -1e-6).all()


def test_sample_pdf_parity_deterministic(rng):
    m = ref_modules()
    R, B, S = 4, 31, 24
    bins = np.sort(rng.uniform(2.0, 6.0, size=(R, B)).astype(np.float32), axis=-1)
    weights = rng.uniform(0.0, 1.0, size=(R, B - 1)).astype(np.float32)

    ref = m.SamplePDF(S)
    expected = ref.sample_pdf(
        torch.from_numpy(bins), torch.from_numpy(weights), ref.u, det=True
    ).numpy()
    got = to_np(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), S, deterministic=True))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_hierarchical_intervals_parity(rng):
    m = ref_modules()
    R, Sc, Sf = 5, 16, 24
    intervals = np.sort(rng.uniform(2.0, 6.0, size=(R, Sc)).astype(np.float32), axis=-1)
    weights = rng.uniform(0.0, 1.0, size=(R, Sc)).astype(np.float32)

    ref = m.SamplePDF(Sf)
    expected = ref(torch.from_numpy(intervals), torch.from_numpy(weights), 0.0).numpy()
    got = to_np(
        hierarchical_intervals(jnp.asarray(intervals), jnp.asarray(weights), Sf, perturb=False)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("white_background", [False, True])
@pytest.mark.parametrize("train", [False, True])
def test_volume_render_parity(rng, white_background, train):
    m = ref_modules()
    R, S = 8, 16
    radiance = rng.standard_normal((R, S, 4)).astype(np.float32)
    radiance[..., :3] = 1.0 / (1.0 + np.exp(-radiance[..., :3]))  # rgb in [0,1]
    z = np.sort(rng.uniform(2.0, 6.0, size=(R, S)).astype(np.float32), axis=-1)
    dirs = rng.standard_normal((R, 3)).astype(np.float32)

    ref = m.VolumeRenderer(0.0, 0.0, white_background, attenuation_threshold=1e-5)
    ref.train(train)
    bundle = ref(torch.from_numpy(radiance), torch.from_numpy(z), torch.from_numpy(dirs))

    out = volume_render(
        jnp.asarray(radiance),
        jnp.asarray(z),
        jnp.asarray(dirs),
        train=train,
        white_background=white_background,
    )
    np.testing.assert_allclose(to_np(out.rgb_map), bundle.rgb_map.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(to_np(out.weights), bundle.weights.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(to_np(out.acc_map), bundle.acc_map.numpy(), rtol=1e-4, atol=1e-5)
    # The eval-only depth zeroing keys on acc < 1.0 exactly; rays whose acc
    # rounds to ~1.0 can land on either side across backends. Compare away
    # from that knife-edge, and check the rule itself with our own acc.
    acc = to_np(out.acc_map)
    stable = np.abs(acc - 1.0) > 1e-5
    np.testing.assert_allclose(
        to_np(out.depth_map)[stable], bundle.depth_map.numpy()[stable],
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        to_np(out.disp_map)[stable], bundle.disp_map.numpy()[stable],
        rtol=1e-4, atol=1e-4,
    )
    if not train:
        assert (to_np(out.depth_map)[acc < 1.0 - 1e-5] == 0).all()
    np.testing.assert_allclose(
        to_np(out.mask_weights), bundle.mask_weights.numpy(), rtol=1e-5, atol=1e-6
    )


def test_get_ray_bundle_parity(rng):
    h = ref_nerf_helpers()
    H, W, focal = 12, 16, 20.0
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = _random_rotation(rng)
    pose[:3, 3] = rng.standard_normal(3)

    ref_o, ref_d = h.get_ray_bundle(H, W, focal, torch.from_numpy(pose))
    origins, dirs = get_ray_bundle(H, W, focal, jnp.asarray(pose))
    np.testing.assert_allclose(to_np(origins), ref_o.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(to_np(dirs), ref_d.numpy(), rtol=1e-5, atol=1e-5)


def test_get_ray_bundle_batched(rng):
    H, W, focal = 6, 8, 10.0
    poses = np.stack([np.eye(4, dtype=np.float32)] * 3)
    poses[1, :3, 3] = [1, 2, 3]
    origins, dirs = get_ray_bundle(H, W, focal, jnp.asarray(poses))
    assert origins.shape == (3, 3) and dirs.shape == (3, H, W, 3)
    o0, d0 = get_ray_bundle(H, W, focal, jnp.asarray(poses[1]))
    np.testing.assert_allclose(to_np(dirs[1]), to_np(d0), rtol=1e-6)
    np.testing.assert_allclose(to_np(origins[1]), to_np(o0), rtol=1e-6)


def test_ndc_rays_parity(rng):
    h = ref_nerf_helpers()
    H, W, focal, near = 10, 14, 15.0, 1.0
    rays_o = rng.standard_normal((7, 3)).astype(np.float32)
    rays_d = rng.standard_normal((7, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5  # forward-facing
    rays_o[:, 2] = -np.abs(rays_o[:, 2]) - 2.0

    ref_o, ref_d = h.ndc_rays(H, W, focal, near, torch.from_numpy(rays_o), torch.from_numpy(rays_d))
    o, d = ndc_rays(H, W, focal, near, jnp.asarray(rays_o), jnp.asarray(rays_d))
    np.testing.assert_allclose(to_np(o), ref_o.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(to_np(d), ref_d.numpy(), rtol=1e-4, atol=1e-5)


def test_intervals_to_ray_points_parity(rng):
    mh = ref_model_helpers()
    R, S = 5, 9
    intervals = rng.uniform(2, 6, size=(R, S)).astype(np.float32)
    dirs = rng.standard_normal((R, 3)).astype(np.float32)
    origins = rng.standard_normal((3,)).astype(np.float32)
    expected = mh.intervals_to_ray_points(
        torch.from_numpy(intervals), torch.from_numpy(dirs), torch.from_numpy(origins)
    ).numpy()
    got = to_np(intervals_to_ray_points(jnp.asarray(intervals), jnp.asarray(dirs), jnp.asarray(origins)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_merge_sorted_equals_sort_concat(rng):
    from nerfmeshes_tpu.ops.sampling import merge_sorted

    a = np.sort(rng.uniform(0, 10, size=(6, 16)).astype(np.float32), axis=-1)
    b = np.sort(rng.uniform(0, 10, size=(6, 24)).astype(np.float32), axis=-1)
    got = to_np(merge_sorted(jnp.asarray(a), jnp.asarray(b)))
    expected = np.sort(np.concatenate([a, b], -1), axis=-1)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_sorted_uniforms_properties():
    from nerfmeshes_tpu.ops.sampling import sorted_uniforms

    u = to_np(sorted_uniforms(jax.random.key(0), (2000, 16)))
    assert (np.diff(u, axis=-1) >= 0).all()
    assert (u >= 0).all() and (u <= 1).all()
    # Marginal of all entries pooled is U(0,1): mean ~0.5, var ~1/12.
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1.0 / 12.0) < 0.005


def test_stochastic_sorted_sample_pdf_distribution(rng):
    """Sorted-uniform inverse-CDF sampling matches the iid+implicit-sort
    distribution: bin occupancy proportional to weights."""
    B, S = 1, 17
    bins = np.linspace(0.0, 1.0, B * (S + 1)).reshape(B, S + 1).astype(np.float32)
    weights = rng.uniform(0.2, 1.0, size=(B, S)).astype(np.float32)
    counts = np.zeros(S)
    n_trials = 200
    for t in range(n_trials):
        s = to_np(
            sample_pdf(
                jnp.asarray(bins), jnp.asarray(weights), 64,
                deterministic=False, key=jax.random.key(t), sorted_uniform=True,
            )
        )
        assert (np.diff(s, axis=-1) >= -1e-6).all()  # sorted output
        hist, _ = np.histogram(s, bins=bins[0])
        counts += hist
    frac = counts / counts.sum()
    expect = (weights[0] + 1e-5) / (weights[0] + 1e-5).sum()
    np.testing.assert_allclose(frac, expect, atol=0.01)


def test_mse2psnr():
    np.testing.assert_allclose(float(mse2psnr(jnp.asarray(0.01))), 20.0, rtol=1e-5)
    assert np.isfinite(float(mse2psnr(jnp.asarray(0.0))))


def _random_rotation(rng):
    a = rng.standard_normal((3, 3)).astype(np.float32)
    q, _ = np.linalg.qr(a)
    return q.astype(np.float32)


def test_volume_render_channels_first_matches(rng):
    """channels_first consumes the fused kernel's (4, R, S) field layout and
    must composite identically to the channel-minor path."""
    R, S = 7, 11
    field = jnp.asarray(rng.standard_normal((R, S, 4)).astype(np.float32))
    field = field.at[..., :3].set(jax.nn.sigmoid(field[..., :3]))
    depths = jnp.asarray(np.sort(rng.uniform(2.0, 6.0, (R, S))).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    a = volume_render(field, depths, dirs, train=False, white_background=True)
    b = volume_render(
        jnp.moveaxis(field, -1, 0), depths, dirs, train=False,
        white_background=True, channels_first=True,
    )
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_pack_rays_matches_points(rng):
    """pack_rays must equal pack_points_dirs over expanded points/dirs."""
    from nerfmeshes_tpu.ops.pallas.fused_mlp import pack_points_dirs, pack_rays
    from nerfmeshes_tpu.ops.rays import intervals_to_ray_points

    R, S = 5, 9
    o = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    z = jnp.asarray(np.sort(rng.uniform(1.0, 4.0, (R, S))).astype(np.float32))
    packed = pack_rays(o, d, z)
    pts = intervals_to_ray_points(z, d, o).reshape(-1, 3)
    dirs = jnp.broadcast_to(d[:, None, :], (R, S, 3)).reshape(-1, 3)
    expect = pack_points_dirs(pts, dirs)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(expect), atol=1e-6)
    assert packed.shape == (8, R * S)
    np.testing.assert_array_equal(np.asarray(packed[6]), 1.0)  # homogeneous row


def test_fused_pe_lane_consts_layout():
    """The combined-PE lane constants reproduce the reference PE when fed
    through the kernel's assembly math (sin via quarter-turn phase)."""
    from nerfmeshes_tpu.ops.encoding import positional_encoding
    from nerfmeshes_tpu.ops.pallas.fused_mlp import (
        MLPSpec, _pe_lane_consts,
    )

    spec = MLPSpec(
        num_layers=4, hidden=128, skip_step=2, L_x=4, L_d=2,
        include_x=True, include_d=True, log_x=True, log_d=True,
    )
    c = np.asarray(_pe_lane_consts(spec))
    rng_ = np.random.default_rng(0)
    pts = rng_.standard_normal((6, 3)).astype(np.float32)
    dirs = rng_.standard_normal((6, 3)).astype(np.float32)
    pd = np.concatenate(
        [pts.T, dirs.T, np.ones((1, 6), np.float32), np.zeros((1, 6), np.float32)]
    )
    s = sum(c[:, k : k + 1] * pd[k : k + 1, :] for k in range(7))
    pe = s + (np.sin(2 * np.pi * s) - s) * c[:, 8:9]  # exact sine stand-in
    ref_x = np.asarray(positional_encoding(jnp.asarray(pts), 4, True, True))
    ref_d = np.asarray(positional_encoding(jnp.asarray(dirs), 2, True, True))
    np.testing.assert_allclose(pe[: ref_x.shape[1]].T, ref_x, atol=1e-5)
    np.testing.assert_allclose(
        pe[spec.d_off : spec.d_off + ref_d.shape[1]].T, ref_d, atol=1e-5
    )


def test_ray_sample_interval_mixed_bounds():
    """Scalar near with per-ray far (and vice versa) must broadcast."""
    import jax.numpy as jnp

    from nerfmeshes_tpu.ops.sampling import ray_sample_interval

    R, S = 5, 7
    per_ray = jnp.linspace(5.0, 9.0, R)
    a = ray_sample_interval(S, R, 2.0, per_ray, lindisp=False, perturb=False)
    assert a.shape == (R, S)
    np.testing.assert_allclose(np.asarray(a[:, -1]), np.asarray(per_ray), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a[:, 0]), 2.0, atol=1e-6)
    b = ray_sample_interval(S, R, per_ray - 4.0, 9.0, lindisp=False, perturb=False)
    assert b.shape == (R, S)
    np.testing.assert_allclose(np.asarray(b[:, 0]), np.asarray(per_ray - 4.0), atol=1e-6)


def test_ssim_properties_and_reference():
    """SSIM: identity == 1, degrades with noise, and matches an
    independent numpy formulation of Wang et al. on random images."""
    import jax.numpy as jnp

    from nerfmeshes_tpu.ops.math import ssim

    rng = np.random.default_rng(0)
    a = rng.uniform(size=(32, 40, 3)).astype(np.float32)
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-5)
    noisy1 = np.clip(a + 0.05 * rng.standard_normal(a.shape), 0, 1).astype(np.float32)
    noisy2 = np.clip(a + 0.2 * rng.standard_normal(a.shape), 0, 1).astype(np.float32)
    s1 = float(ssim(jnp.asarray(a), jnp.asarray(noisy1)))
    s2 = float(ssim(jnp.asarray(a), jnp.asarray(noisy2)))
    assert 1.0 > s1 > s2 > 0.0

    # Independent numpy reference: same constants, gaussian window built
    # from the outer product, explicit per-window loops over valid pixels.
    def np_ssim(x, y, w=11, sigma=1.5, L=1.0):
        half = w // 2
        g1 = np.exp(-0.5 * ((np.arange(w) - half) / sigma) ** 2)
        g1 /= g1.sum()
        G = np.outer(g1, g1)
        H, W, C = x.shape
        c1, c2 = (0.01 * L) ** 2, (0.03 * L) ** 2
        vals = []
        for c in range(C):
            for i in range(H - w + 1):
                for j in range(W - w + 1):
                    px = x[i : i + w, j : j + w, c]
                    py = y[i : i + w, j : j + w, c]
                    mx, my = (G * px).sum(), (G * py).sum()
                    vx = (G * px * px).sum() - mx * mx
                    vy = (G * py * py).sum() - my * my
                    vxy = (G * px * py).sum() - mx * my
                    vals.append(
                        ((2 * mx * my + c1) * (2 * vxy + c2))
                        / ((mx * mx + my * my + c1) * (vx + vy + c2))
                    )
        return float(np.mean(vals))

    small_a = a[:16, :18]
    small_b = noisy2[:16, :18]
    ref = np_ssim(small_a.astype(np.float64), small_b.astype(np.float64))
    got = float(ssim(jnp.asarray(small_a), jnp.asarray(small_b)))
    assert got == pytest.approx(ref, abs=1e-4)
