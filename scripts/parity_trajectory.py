"""Training-trajectory parity: torch reference vs this rebuild on
IDENTICAL data with IDENTICAL initial weights.

The one end-to-end claim op-level parity tests cannot establish (VERDICT
r1 item 1): that a full training run of the rebuild reproduces the
reference's optimization trajectory. Both stacks train the same
tiny-but-nontrivial hierarchical workload (4x64 coarse+fine FlexibleNeRF,
32+32 samples) on the SAME precomputed ray batches from the procedural
scene, starting from the SAME weights (torch init transplanted into the
flax params), with deterministic settings (perturb off, sigma noise 0) —
so the trajectories differ only by framework numerics.

Reference semantics matched: NeRFModel.forward
(/root/reference/src/models/model_nerf.py:37-78 — sampler -> coarse ->
VolumeRenderer -> SamplePDF merge -> fine), coarse+fine summed MSE
(model_nerf.py:113-125), Adam (model_base.py:160).

Usage: python scripts/parity_trajectory.py [--steps 500] [--rays 256]
Prints a JSON summary; run by tests/test_parity.py at reduced size.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _setup_jax_cpu():
    import jax

    # Trajectory parity wants the highest-precision deterministic substrate
    # both stacks share: CPU f32 with full-precision matmuls.
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    jax.config.update("jax_default_matmul_precision", "highest")
    return jax


ARCH = dict(
    num_layers=4,
    hidden_size=64,
    skip_step=4,
    num_encoding_fn_xyz=6,
    num_encoding_fn_dir=4,
    use_viewdirs=True,
)
NUM_COARSE = 32
NUM_FINE = 32
NEAR, FAR = 2.0, 6.0
LR = 5e-4  # robust region (the shipped 5e-3 can collapse either stack)


def make_batches(num_steps: int, rays_per_step: int, image_size: int = 32,
                 num_images: int = 6, eval_rays: int = 4096):
    """Fixed (origins, dirs, targets) batches + a held-out eval set, all
    numpy — the single source both stacks consume."""
    jax = _setup_jax_cpu()
    import numpy as np

    from nerfmeshes_tpu.data.synthetic import make_synthetic_dataset
    from nerfmeshes_tpu.ops.rays import get_ray_bundle
    import jax.numpy as jnp

    bundle = make_synthetic_dataset(num_images=num_images, image_size=image_size,
                                    near=NEAR, far=FAR, seed=0)
    H, W, focal = (int(bundle.hwf[0]), int(bundle.hwf[1]), float(bundle.hwf[2]))
    origins, dirs = get_ray_bundle(H, W, focal, jnp.asarray(bundle.poses))
    origins = np.asarray(
        jnp.broadcast_to(origins[:, None, None, :], dirs.shape)
    ).reshape(num_images, H * W, 3)
    dirs = np.asarray(dirs).reshape(num_images, H * W, 3)
    targets = np.asarray(bundle.ray_targets).reshape(num_images, H * W, 3)

    rng = np.random.default_rng(7)
    batches = []
    for _ in range(num_steps):
        img = int(rng.integers(num_images))
        pix = rng.integers(0, H * W, size=rays_per_step)
        batches.append(
            (origins[img, pix].copy(), dirs[img, pix].copy(), targets[img, pix].copy())
        )

    eval_bundle = make_synthetic_dataset(num_images=2, image_size=image_size,
                                         near=NEAR, far=FAR, seed=1)
    eo, ed = get_ray_bundle(H, W, focal, jnp.asarray(eval_bundle.poses))
    eo = np.asarray(jnp.broadcast_to(eo[:, None, None, :], ed.shape)).reshape(-1, 3)
    ed = np.asarray(ed).reshape(-1, 3)
    et = np.asarray(eval_bundle.ray_targets).reshape(-1, 3)
    pix = np.random.default_rng(11).integers(0, ed.shape[0], size=eval_rays)
    return batches, (eo[pix], ed[pix], et[pix])


def run_reference(batches, eval_set, seed: int = 0, stochastic: bool = False):
    """Train the reference's own torch modules in place on the fixed
    batches; return (models, losses, final eval PSNR).

    `stochastic` enables the shipped config's regularizers (perturb=True,
    sigma noise 0.2, config/nerf-synthetic-lego.yml:186-188) — the regime
    where the reference trains stably. Deterministic mode (both off) is
    for step-level numeric comparison only; there the reference itself is
    violently seed-sensitive (measured: 24.4 / 16.3 / 11.6 dB final PSNR
    across torch seeds 0/1/2 at 500 steps)."""
    import numpy as np
    import torch

    from refload import ref_model_helpers, ref_models, ref_modules

    import copy

    torch.manual_seed(seed)
    m = ref_modules()
    models = ref_models()
    mh = ref_model_helpers()

    coarse = models.FlexibleNeRFModel(**ARCH)
    fine = models.FlexibleNeRFModel(**ARCH)
    # Snapshot the INITIAL weights — these are what run_rebuild transplants
    # (returning the trained modules here once silently handed the rebuild a
    # pre-trained start and inflated its PSNR by ~5 dB).
    init_models = (copy.deepcopy(coarse), copy.deepcopy(fine))
    sampler = m.RaySampleInterval(NUM_COARSE)
    sample_pdf = m.SamplePDF(NUM_FINE)
    noise = 0.2 if stochastic else 0.0
    renderer = m.VolumeRenderer(noise, 0.0, False, attenuation_threshold=1e-5)

    opt = torch.optim.Adam(
        list(coarse.parameters()) + list(fine.parameters()), lr=LR
    )

    class _NS:
        lindisp = False
        perturb = stochastic

    cfg_mode = _NS()
    near, far = torch.tensor(NEAR), torch.tensor(FAR)

    def forward(o, d, train):
        cfg_mode.perturb = stochastic and train
        intervals = sampler(cfg_mode, d.shape[0], near, far)
        pts = mh.intervals_to_ray_points(intervals, d, o)
        cb = renderer(coarse(pts, d[..., None, :].expand_as(pts)), intervals, d)
        fi = sample_pdf(
            intervals, cb.weights, 1.0 if (stochastic and train) else 0.0
        )
        pts = mh.intervals_to_ray_points(fi, d, o)
        fb = renderer(fine(pts, d[..., None, :].expand_as(pts)), fi, d)
        return cb, fb

    losses = []
    for o, d, t in batches:
        o, d, t = map(torch.from_numpy, (o, d, t))
        opt.zero_grad()
        cb, fb = forward(o, d, train=True)
        loss = torch.nn.functional.mse_loss(cb.rgb_map, t) + \
            torch.nn.functional.mse_loss(fb.rgb_map, t)
        loss.backward()
        opt.step()
        losses.append(float(loss))

    renderer.eval()
    coarse.eval()
    fine.eval()
    eo, ed, et = eval_set
    with torch.no_grad():
        mses = []
        for i in range(0, ed.shape[0], 1024):
            sl = slice(i, i + 1024)
            _, fb = forward(
                torch.from_numpy(eo[sl]), torch.from_numpy(ed[sl]), train=False
            )
            mses.append(
                torch.nn.functional.mse_loss(
                    fb.rgb_map, torch.from_numpy(et[sl])
                ).item()
            )
    psnr = -10.0 * np.log10(np.mean(mses))
    return init_models, losses, float(psnr)


def run_rebuild(batches, eval_set, ref_torch_models, stochastic: bool = False,
                seed: int = 0):
    """Train the rebuild on the same batches from the reference's initial
    weights (transplanted); return (losses, final eval PSNR)."""
    jax = _setup_jax_cpu()
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nerfmeshes_tpu.models.nerf_models import FlexibleNeRFModel
    from nerfmeshes_tpu.ops.math import img2mse
    from nerfmeshes_tpu.train.render import RenderSettings, render_rays
    from test_models import _transplant_flexible

    coarse = FlexibleNeRFModel(**ARCH)
    fine = FlexibleNeRFModel(**ARCH)
    pts = jnp.zeros((2, 2, 3))
    params = {
        "coarse": coarse.init(jax.random.key(0), pts, pts),
        "fine": fine.init(jax.random.key(1), pts, pts),
    }
    ref_coarse, ref_fine = ref_torch_models
    params["coarse"] = _transplant_flexible(
        params["coarse"], ref_coarse, ARCH["use_viewdirs"], ARCH["num_layers"]
    )
    params["fine"] = _transplant_flexible(
        params["fine"], ref_fine, ARCH["use_viewdirs"], ARCH["num_layers"]
    )

    settings = RenderSettings(
        num_coarse=NUM_COARSE,
        num_fine=NUM_FINE,
        perturb=stochastic,
        lindisp=False,
        radiance_field_noise_std=0.2 if stochastic else 0.0,
        white_background=False,
        use_fine=True,
        use_fused_kernel=False,  # CPU parity run; kernel parity is tested separately
    )
    opt = optax.adam(LR)
    opt_state = opt.init(params)

    def loss_fn(p, o, d, t, key):
        cb, fb = render_rays(
            coarse, fine, p, o, d, NEAR, FAR, settings, train=True, key=key
        )
        return img2mse(cb.rgb_map, t) + img2mse(fb.rgb_map, t)

    @jax.jit
    def step(p, s, o, d, t, key):
        loss, g = jax.value_and_grad(loss_fn)(p, o, d, t, key)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    base_key = jax.random.key(seed)
    for i, (o, d, t) in enumerate(batches):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t),
            jax.random.fold_in(base_key, i),
        )
        losses.append(float(loss))

    @jax.jit
    def eval_chunk(p, o, d):
        _, fb = render_rays(coarse, fine, p, o, d, NEAR, FAR, settings, train=False)
        return fb.rgb_map

    eo, ed, et = eval_set
    mses = []
    for i in range(0, ed.shape[0], 1024):
        sl = slice(i, i + 1024)
        rgb = eval_chunk(params, jnp.asarray(eo[sl]), jnp.asarray(ed[sl]))
        mses.append(float(jnp.mean((rgb - jnp.asarray(et[sl])) ** 2)))
    psnr = -10.0 * np.log10(np.mean(mses))
    return losses, float(psnr)


def main(num_steps: int = 500, rays_per_step: int = 256,
         stochastic: bool = True, ref_seeds=(0,), our_seeds=(0,)) -> dict:
    import numpy as np

    batches, eval_set = make_batches(num_steps, rays_per_step)
    ref_runs = []
    ref_models_t = None
    for s in ref_seeds:
        models_t, losses, psnr = run_reference(
            batches, eval_set, seed=s, stochastic=stochastic
        )
        if ref_models_t is None:
            ref_models_t = models_t  # seed-0 init is the transplant source
        ref_runs.append({"seed": s, "final_loss": losses[-1], "psnr": psnr,
                         "losses": losses})
        print(f"ref seed {s}: psnr {psnr:.2f} dB", flush=True)
    our_runs = []
    for s in our_seeds:
        losses, psnr = run_rebuild(
            batches, eval_set, ref_models_t, stochastic=stochastic, seed=s
        )
        our_runs.append({"seed": s, "final_loss": losses[-1], "psnr": psnr,
                         "losses": losses})
        print(f"ours seed {s}: psnr {psnr:.2f} dB", flush=True)

    ref_l = np.asarray(ref_runs[0]["losses"])
    our_l = np.asarray(our_runs[0]["losses"])
    corr = float(np.corrcoef(np.log(ref_l + 1e-12), np.log(our_l + 1e-12))[0, 1])
    summary = {
        "steps": num_steps,
        "rays_per_step": rays_per_step,
        "stochastic": stochastic,
        "ref_psnrs": [r["psnr"] for r in ref_runs],
        "our_psnrs": [r["psnr"] for r in our_runs],
        "psnr_delta_vs_ref_seed0": our_runs[0]["psnr"] - ref_runs[0]["psnr"],
        "log_loss_corr": corr,
        "ref_final_losses": [r["final_loss"] for r in ref_runs],
        "our_final_losses": [r["final_loss"] for r in our_runs],
    }
    print(json.dumps(summary, indent=2))
    return summary





# ---------------------------------------------------------------------------
# BuFF composed-loop trajectory parity (VERDICT r2 item 4): the full
# intersect -> render -> integrate -> consolidate loop side-by-side with
# the torch reference (src/models/model_buff.py:34-107 + src/nerf/tree.py)
# on identical batches from identical init.
# ---------------------------------------------------------------------------

BUFF_TREE = dict(
    subdivision_outer_count=6,
    subdivision_inner_count=2,
    max_depth=3,
    eps=1e-4,
    use_random_sampling=False,
    max_voxel_count=400,
    step_size_integration_offset=100,
    step_size_tree=150,
)
NUM_BUFF_SAMPLES = 32


class _Bag:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _sorted_boxes(voxels):
    import numpy as np

    v = np.asarray(voxels, np.float64).reshape(len(voxels), -1)
    return v[np.lexsort(v.T[::-1])]


def _tree_agreement(ref_boxes, our_boxes, atol=1e-5):
    """Fraction of voxels present in both trees (boxes matched as sets)."""
    import numpy as np

    a, b = _sorted_boxes(ref_boxes), _sorted_boxes(our_boxes)
    i = j = match = 0
    while i < len(a) and j < len(b):
        d = a[i] - b[j]
        nz = d[np.abs(d) > atol]
        if len(nz) == 0:
            match += 1
            i += 1
            j += 1
        elif nz[0] < 0:
            i += 1
        else:
            j += 1
    denom = max(len(a), len(b))
    return match / max(denom, 1), len(a), len(b)


def _containing_voxel_indices(o, d, z, voxels, fallback):
    """Geometrically correct voxel attribution for sample points o + d*z:
    index of the (unique, chords are disjoint) voxel containing each
    point, `fallback` where none does (stratified-fallback rays).

    Needed because the reference's deterministic sampler returns z-values
    packed stably but maps indices through torch's UNSTABLE descending
    sort of the hit mask (/root/reference/src/nerf/tree.py:306,334), so
    its integration attributes weights to mis-ordered voxels (pinned at
    component level by tests/test_buff.py::test_intersect_parity_with_reference).
    The corrected-attribution reference mode integrates the same rendered
    weights into the right cells, making tree DECISIONS comparable."""
    import numpy as np

    pts = o[:, None, :] + d[:, None, :] * z[..., None]  # (R, S, 3)
    lo, hi = voxels[:, 0, :], voxels[:, 1, :]  # (V, 3)
    eps = 1e-5
    inside = np.all(
        (pts[:, :, None, :] >= lo[None, None] - eps)
        & (pts[:, :, None, :] <= hi[None, None] + eps),
        axis=-1,
    )  # (R, S, V)
    any_in = inside.any(-1)
    idx = inside.argmax(-1)
    return np.where(any_in, idx, fallback)


def run_reference_buff(batches, eval_set, seed: int = 0, stochastic: bool = False,
                       fix_ref_indices: bool = False):
    """Train the reference's BuFF loop in place (its own TreeSampling +
    FlexibleNeRFModel + VolumeRenderer; model_buff.py:34-107 semantics:
    stratified fallback where no voxel hit, masked integration at
    global_step, consolidation when ticked). With `fix_ref_indices` the
    integration uses geometrically corrected voxel attribution (see
    _containing_voxel_indices) instead of the reference's scrambled ids.
    Returns (init_model, losses, psnr, tree_snapshots)."""
    import copy

    import numpy as np
    import torch

    from refload import ref_model_helpers, ref_models, ref_modules, ref_tree

    torch.manual_seed(seed)
    trees = ref_tree()
    models = ref_models()
    m = ref_modules()
    mh = ref_model_helpers()

    cfg = _Bag(tree=_Bag(**BUFF_TREE), dataset=_Bag(near=NEAR, far=FAR))
    tree = trees.TreeSampling(cfg, "cpu")
    model = models.FlexibleNeRFModel(**ARCH)
    init_model = copy.deepcopy(model)
    sampler = m.RaySampleInterval(NUM_BUFF_SAMPLES)
    noise = 0.2 if stochastic else 0.0
    renderer = m.VolumeRenderer(noise, 0.0, False, attenuation_threshold=1e-5)
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    near, far = torch.tensor(NEAR), torch.tensor(FAR)

    mode = _Bag(lindisp=False, perturb=stochastic)

    def forward(o, d, train, step):
        mode.perturb = stochastic and train
        ray_samples = sampler(mode, d.shape[0], near, far)
        intervals, indices, mask = tree.batch_ray_voxel_intersect(
            o, d, near, far, samples_count=NUM_BUFF_SAMPLES
        )
        if fix_ref_indices:
            import numpy as np

            corrected = _containing_voxel_indices(
                o.numpy() if o.ndim == 2 else np.broadcast_to(o.numpy(), d.shape),
                d.numpy(), intervals.detach().numpy(),
                tree.voxels.numpy(), fallback=0,
            )
            indices = torch.from_numpy(np.ascontiguousarray(corrected)).long()
        intervals[~mask] = ray_samples[~mask]
        pts = mh.intervals_to_ray_points(intervals, d, o)
        bundle = renderer(model(pts, d[..., None, :].expand_as(pts)), intervals, d)
        if train:
            tree.ray_batch_integration(
                step, indices[mask], bundle.weights[mask].detach(),
                bundle.mask_weights[mask].detach(),
            )
        return bundle

    losses, snapshots = [], []
    for step, (o, d, t) in enumerate(batches):
        o, d, t = map(torch.from_numpy, (o, d, t))
        opt.zero_grad()
        b = forward(o, d, True, step)
        loss = torch.nn.functional.mse_loss(b.rgb_map, t)
        loss.backward()
        opt.step()
        losses.append(float(loss))
        if tree.ticked(step):
            tree.consolidate()
            snapshots.append((step, tree.voxels.detach().cpu().numpy().copy()))

    renderer.eval()
    model.eval()
    eo, ed, et = eval_set
    with torch.no_grad():
        mses = []
        for i in range(0, ed.shape[0], 1024):
            sl = slice(i, i + 1024)
            b = forward(torch.from_numpy(eo[sl]), torch.from_numpy(ed[sl]),
                        train=False, step=-1)
            mses.append(torch.nn.functional.mse_loss(
                b.rgb_map, torch.from_numpy(et[sl])).item())
    psnr = -10.0 * np.log10(np.mean(mses))
    return init_model, losses, float(psnr), snapshots


def run_rebuild_buff(batches, eval_set, ref_torch_model, stochastic: bool = False,
                     seed: int = 0):
    """The rebuild's BuFF loop (buff_render_rays + integrate + host
    consolidation) on the same batches from the transplanted init,
    consolidating on the reference's ticked() schedule. Returns
    (losses, psnr, tree_snapshots)."""
    jax = _setup_jax_cpu()
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nerfmeshes_tpu.buff.system import buff_render_rays
    from nerfmeshes_tpu.buff.tree import TreeSampling, integrate
    from nerfmeshes_tpu.config import get_default_cfg
    from nerfmeshes_tpu.models.nerf_models import FlexibleNeRFModel
    from nerfmeshes_tpu.ops.math import img2mse
    from nerfmeshes_tpu.train.render import RenderSettings
    from test_models import _transplant_flexible

    cfg = get_default_cfg()
    for k, v in BUFF_TREE.items():
        setattr(cfg.tree, k, v)
    cfg.dataset.near, cfg.dataset.far = NEAR, FAR

    model = FlexibleNeRFModel(**ARCH)
    pts = jnp.zeros((2, 2, 3))
    params = model.init(jax.random.key(0), pts, pts)
    params = _transplant_flexible(
        params, ref_torch_model, ARCH["use_viewdirs"], ARCH["num_layers"]
    )

    settings = RenderSettings(
        num_coarse=NUM_BUFF_SAMPLES,
        num_fine=0,
        perturb=stochastic,
        lindisp=False,
        radiance_field_noise_std=0.2 if stochastic else 0.0,
        white_background=False,
        use_fine=False,
        use_fused_kernel=False,
    )
    tree = TreeSampling(cfg)
    tree_state = tree.device_state()
    offset = BUFF_TREE["step_size_integration_offset"]
    sst = BUFF_TREE["step_size_tree"]

    opt = optax.adam(LR)
    opt_state = opt.init(params)

    from functools import partial

    @partial(jax.jit, static_argnames=("do_integrate",))
    def step_fn(p, s, ts, o, d, t, key, do_integrate):
        def loss_fn(p):
            bundle, vox, rmask, _ = buff_render_rays(
                model, p, ts, o, d, NEAR, FAR, settings, train=True,
                use_random_sampling=False, key=key,
            )
            return img2mse(bundle.rgb_map, t), (bundle, vox, rmask)

        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, s = opt.update(g, s, p)
        p = optax.apply_updates(p, updates)
        if do_integrate:
            bundle, vox, rmask = aux
            ts = integrate(
                ts, vox, jax.lax.stop_gradient(bundle.weights),
                jax.lax.stop_gradient(bundle.mask_weights), rmask,
            )
        return p, s, ts, loss

    losses, snapshots = [], []
    base_key = jax.random.key(seed)
    for step, (o, d, t) in enumerate(batches):
        params, opt_state, tree_state, loss = step_fn(
            params, opt_state, tree_state, jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(t), jax.random.fold_in(base_key, step),
            do_integrate=step >= offset,
        )
        losses.append(float(loss))
        # Reference's ticked() convention (tree.py:94-101).
        if step > offset and (step - offset) % sst == 0:
            tree_state = tree.consolidate(np.asarray(tree_state.memm))
            boxes = np.stack(
                [np.stack([l.lo, l.hi]) for l in tree.leaves]
            )
            snapshots.append((step, boxes))

    @jax.jit
    def eval_chunk(p, ts, o, d):
        bundle, _, _, _ = buff_render_rays(
            model, p, ts, o, d, NEAR, FAR, settings, train=False,
            use_random_sampling=False,
        )
        return bundle.rgb_map

    eo, ed, et = eval_set
    mses = []
    for i in range(0, ed.shape[0], 1024):
        sl = slice(i, i + 1024)
        rgb = eval_chunk(params, tree_state, jnp.asarray(eo[sl]), jnp.asarray(ed[sl]))
        mses.append(float(jnp.mean((rgb - jnp.asarray(et[sl])) ** 2)))
    psnr = -10.0 * np.log10(np.mean(mses))
    return losses, float(psnr), snapshots


def main_buff(num_steps: int = 500, rays_per_step: int = 256) -> dict:
    """The full BuFF composed-loop study:

    1. Stochastic regime (shipped perturb + sigma noise), stock
       reference: loss-trajectory correlation + final PSNR parity.
    2. Deterministic regime, CORRECTED-attribution reference (the stock
       reference integrates weights into mis-ordered voxels — see
       _containing_voxel_indices): per-boundary tree prune/subdivide
       agreement, ours vs corrected-ref, plus stock-vs-corrected ref
       agreement quantifying the reference's own attribution bug."""
    import numpy as np

    batches, eval_set = make_batches(num_steps, rays_per_step)

    # -- 1. stochastic trajectory parity (stock reference) ------------------
    init_model, ref_losses, ref_psnr, _ = run_reference_buff(
        batches, eval_set, seed=0, stochastic=True
    )
    print(f"buff ref (stock, stochastic): psnr {ref_psnr:.2f} dB", flush=True)
    our_losses, our_psnr, _ = run_rebuild_buff(
        batches, eval_set, init_model, stochastic=True
    )
    print(f"buff ours (stochastic): psnr {our_psnr:.2f} dB", flush=True)
    corr = float(np.corrcoef(
        np.log(np.asarray(ref_losses) + 1e-12),
        np.log(np.asarray(our_losses) + 1e-12),
    )[0, 1])

    # -- 2. deterministic tree-decision parity (corrected reference) --------
    init_d, _, _, snaps_fixed = run_reference_buff(
        batches, eval_set, seed=0, stochastic=False, fix_ref_indices=True
    )
    _, _, _, snaps_stock = run_reference_buff(
        batches, eval_set, seed=0, stochastic=False, fix_ref_indices=False
    )
    _, _, our_snaps = run_rebuild_buff(
        batches, eval_set, init_d, stochastic=False
    )
    agreements = []
    for (rs, rb), (os_, ob), (_, sb) in zip(snaps_fixed, our_snaps, snaps_stock):
        assert rs == os_, f"consolidation steps differ: {rs} vs {os_}"
        frac, nr, no = _tree_agreement(rb, ob)
        stock_frac, _, _ = _tree_agreement(rb, sb)
        agreements.append({
            "step": rs, "ours_vs_corrected_ref": frac,
            "stock_vs_corrected_ref": stock_frac,
            "corrected_ref_voxels": nr, "our_voxels": no,
        })

    summary = {
        "workload": "buff",
        "steps": num_steps,
        "rays_per_step": rays_per_step,
        "ref_psnr": ref_psnr,
        "our_psnr": our_psnr,
        "psnr_delta": our_psnr - ref_psnr,
        "log_loss_corr": corr,
        "tree_agreement": agreements,
        "ref_final_loss": ref_losses[-1],
        "our_final_loss": our_losses[-1],
    }
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--rays", type=int, default=256)
    ap.add_argument("--deterministic", action="store_true",
                    help="disable perturb + sigma noise (step-level numerics mode)")
    ap.add_argument("--buff", action="store_true",
                    help="run the BuFF composed-loop parity study instead")
    ap.add_argument("--ref-seeds", type=int, nargs="+", default=[0])
    ap.add_argument("--our-seeds", type=int, nargs="+", default=[0])
    args = ap.parse_args()
    if args.buff:
        main_buff(args.steps, args.rays)
    else:
        main(args.steps, args.rays, stochastic=not args.deterministic,
             ref_seeds=tuple(args.ref_seeds), our_seeds=tuple(args.our_seeds))
