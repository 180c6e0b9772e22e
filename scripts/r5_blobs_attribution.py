"""Blobs-scene BuFF-vs-hierarchical gap attribution (VERDICT r4 item 4).

Question: at the 12k-step 96^2 blobs budget our stack shows hierarchical >
BuFF by ~2.6 dB (3-seed means, buff_sweep_seeds.json). Is that ordering
inherent to the BuFF algorithm (the torch reference reproduces it) or a
rebuild deficiency (it doesn't)?

The torch reference at the shipped protocol costs ~70 h/seed on this
1-vCPU host (measured r5 probe), so both stacks run ONE identical reduced
protocol instead:

  scene        procedural blobs, 16 train views + 2 held-out views, 64^2
  rays/step    512, 3000 steps, Adam lr 5e-4, stochastic regime
               (perturb=True, sigma noise 0.2 — the regime the reference
               trains stably in; see parity_trajectory.py docstring)
  hierarchical FlexibleNeRF 4x64 coarse + fine, 16 + 32 samples
  BuFF         one FlexibleNeRF 4x64, 48 samples (same total ray-samples
               and the shipped 1:3 hier:buff sample split, cf.
               nerf-synthetic-lego 64+128 vs buff-synthetic-lego 192)
  tree         the SHIPPED structure (outer 12 -> 1728 cells, inner 2,
               depth 4, eps 1e-4, cap 1536, deterministic chords;
               reference config/buff-synthetic-lego.yml) with the
               schedule scaled to the budget: integration offset 250,
               consolidation every 750 (ticks at 1000/1750/2500 — the
               same ~4-tick count the 12k protocol had)

Each (stack, system, seed) trains from its OWN native init (no weight
transplant — we compare the hier-minus-BuFF ORDERING within each stack,
not absolute PSNR across stacks). 3 seeds each; eval = 4096 rays from the
2 held-out views, identical for every run.

Reference semantics: BuFF loop src/models/model_buff.py:34-107 +
src/nerf/tree.py (TreeSampling); hierarchical src/models/model_nerf.py:37-78.

Usage (one run per process — the tunnel compiler can wedge; a queue
script retries):
  python scripts/r5_blobs_attribution.py --run torch buff 42
  python scripts/r5_blobs_attribution.py --run jax hier 0 --platform tpu
  python scripts/r5_blobs_attribution.py --probe 30   # torch step-cost probe
  python scripts/r5_blobs_attribution.py --summarize
Each completed run is appended to r5_blobs_attribution.json keyed
"{stack}_{system}_{seed}".
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tests"))
sys.path.insert(0, str(ROOT))

OUT = ROOT / "r5_blobs_attribution.json"

ARCH = dict(
    num_layers=4,
    hidden_size=64,
    skip_step=4,
    num_encoding_fn_xyz=6,
    num_encoding_fn_dir=4,
    use_viewdirs=True,
)
HIER_COARSE, HIER_FINE = 16, 32
BUFF_SAMPLES = 48
RAYS = 512
STEPS = 3000
IMAGE_SIZE = 64
NUM_TRAIN_IMAGES = 16
EVAL_RAYS = 4096
NEAR, FAR = 2.0, 6.0
LR = 5e-4
NOISE = 0.2  # shipped radiance_field_noise_std
TREE = dict(
    subdivision_outer_count=12,
    subdivision_inner_count=2,
    max_depth=4,
    eps=1e-4,
    use_random_sampling=False,
    max_voxel_count=1536,
    step_size_integration_offset=250,
    step_size_tree=750,
)


def _ticks(steps=STEPS):
    """Consolidation steps under the reference's ticked() convention
    (src/nerf/tree.py:94-101): step > offset and (step-offset) % sst == 0.
    Reads TREE at call time so CLI schedule overrides apply."""
    offset = TREE["step_size_integration_offset"]
    sst = TREE["step_size_tree"]
    return [s for s in range(steps) if s > offset and (s - offset) % sst == 0]


class _Bag:
    def __init__(self, **kw):
        self.__dict__.update(kw)


# ---------------------------------------------------------------------------
# Shared data: per-seed train batches, pinned eval set
# ---------------------------------------------------------------------------

def make_data(seed: int, num_steps: int = STEPS, rays: int = RAYS):
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")  # data gen is host-side
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from nerfmeshes_tpu.data.synthetic import make_synthetic_dataset
    from nerfmeshes_tpu.ops.rays import get_ray_bundle

    bundle = make_synthetic_dataset(
        num_images=NUM_TRAIN_IMAGES, image_size=IMAGE_SIZE,
        near=NEAR, far=FAR, seed=0, scene="blobs",
    )
    H, W, focal = int(bundle.hwf[0]), int(bundle.hwf[1]), float(bundle.hwf[2])
    origins, dirs = get_ray_bundle(H, W, focal, jnp.asarray(bundle.poses))
    origins = np.asarray(
        jnp.broadcast_to(origins[:, None, None, :], dirs.shape)
    ).reshape(NUM_TRAIN_IMAGES, H * W, 3)
    dirs = np.asarray(dirs).reshape(NUM_TRAIN_IMAGES, H * W, 3)
    targets = np.asarray(bundle.ray_targets).reshape(NUM_TRAIN_IMAGES, H * W, 3)

    rng = np.random.default_rng(1000 + seed)
    o = np.empty((num_steps, rays, 3), np.float32)
    d = np.empty((num_steps, rays, 3), np.float32)
    t = np.empty((num_steps, rays, 3), np.float32)
    for s in range(num_steps):
        img = int(rng.integers(NUM_TRAIN_IMAGES))
        pix = rng.integers(0, H * W, size=rays)
        o[s], d[s], t[s] = origins[img, pix], dirs[img, pix], targets[img, pix]

    ev = make_synthetic_dataset(num_images=2, image_size=IMAGE_SIZE,
                                near=NEAR, far=FAR, seed=1, scene="blobs")
    eo, ed = get_ray_bundle(H, W, focal, jnp.asarray(ev.poses))
    eo = np.asarray(jnp.broadcast_to(eo[:, None, None, :], ed.shape)).reshape(-1, 3)
    ed = np.asarray(ed).reshape(-1, 3)
    et = np.asarray(ev.ray_targets).reshape(-1, 3)
    pix = np.random.default_rng(11).integers(0, ed.shape[0], size=EVAL_RAYS)
    return (o, d, t), (eo[pix].astype(np.float32), ed[pix].astype(np.float32),
                       et[pix].astype(np.float32))


# ---------------------------------------------------------------------------
# Torch reference runners (modules loaded in place via tests/refload.py)
# ---------------------------------------------------------------------------

def run_torch_hier(batches, eval_set, seed: int) -> dict:
    import numpy as np
    import torch

    from refload import ref_model_helpers, ref_models, ref_modules

    torch.manual_seed(seed)
    m = ref_modules()
    models = ref_models()
    mh = ref_model_helpers()

    coarse = models.FlexibleNeRFModel(**ARCH)
    fine = models.FlexibleNeRFModel(**ARCH)
    sampler = m.RaySampleInterval(HIER_COARSE)
    sample_pdf = m.SamplePDF(HIER_FINE)
    renderer = m.VolumeRenderer(NOISE, 0.0, False, attenuation_threshold=1e-5)
    opt = torch.optim.Adam(list(coarse.parameters()) + list(fine.parameters()),
                           lr=LR)
    near, far = torch.tensor(NEAR), torch.tensor(FAR)
    mode = _Bag(lindisp=False, perturb=True)

    def forward(o, d, train):
        mode.perturb = train
        intervals = sampler(mode, d.shape[0], near, far)
        pts = mh.intervals_to_ray_points(intervals, d, o)
        cb = renderer(coarse(pts, d[..., None, :].expand_as(pts)), intervals, d)
        fi = sample_pdf(intervals, cb.weights, 1.0 if train else 0.0)
        pts = mh.intervals_to_ray_points(fi, d, o)
        fb = renderer(fine(pts, d[..., None, :].expand_as(pts)), fi, d)
        return cb, fb

    bo, bd, bt = batches
    t0 = time.time()
    for s in range(bo.shape[0]):
        o, d, t = map(torch.from_numpy, (bo[s], bd[s], bt[s]))
        opt.zero_grad()
        cb, fb = forward(o, d, train=True)
        loss = torch.nn.functional.mse_loss(cb.rgb_map, t) + \
            torch.nn.functional.mse_loss(fb.rgb_map, t)
        loss.backward()
        opt.step()
        if s % 500 == 0:
            print(f"  torch hier step {s} loss {float(loss):.5f}", flush=True)
    train_s = time.time() - t0

    renderer.eval(); coarse.eval(); fine.eval()
    eo, ed, et = eval_set
    with torch.no_grad():
        mses, cmses = [], []
        for i in range(0, ed.shape[0], 1024):
            sl = slice(i, i + 1024)
            cb, fb = forward(torch.from_numpy(eo[sl]), torch.from_numpy(ed[sl]),
                             train=False)
            mses.append(torch.nn.functional.mse_loss(
                fb.rgb_map, torch.from_numpy(et[sl])).item())
            cmses.append(torch.nn.functional.mse_loss(
                cb.rgb_map, torch.from_numpy(et[sl])).item())
    psnr = float(-10.0 * np.log10(np.mean(mses)))
    coarse_psnr = float(-10.0 * np.log10(np.mean(cmses)))
    return {"psnr": psnr, "coarse_psnr": coarse_psnr, "train_s": train_s}


def run_torch_buff(batches, eval_set, seed: int) -> dict:
    import numpy as np
    import torch

    from refload import ref_model_helpers, ref_models, ref_modules, ref_tree

    torch.manual_seed(seed)
    trees = ref_tree()
    models = ref_models()
    m = ref_modules()
    mh = ref_model_helpers()

    cfg = _Bag(tree=_Bag(**TREE), dataset=_Bag(near=NEAR, far=FAR))
    tree = trees.TreeSampling(cfg, "cpu")
    model = models.FlexibleNeRFModel(**ARCH)
    sampler = m.RaySampleInterval(BUFF_SAMPLES)
    renderer = m.VolumeRenderer(NOISE, 0.0, False, attenuation_threshold=1e-5)
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    near, far = torch.tensor(NEAR), torch.tensor(FAR)
    mode = _Bag(lindisp=False, perturb=True)

    def forward(o, d, train, step):
        # BuFFModel.forward semantics (model_buff.py:34-69): stratified
        # fallback where no voxel hit, masked integration while training.
        mode.perturb = train
        ray_samples = sampler(mode, d.shape[0], near, far)
        intervals, indices, mask = tree.batch_ray_voxel_intersect(
            o, d, near, far, samples_count=BUFF_SAMPLES
        )
        intervals[~mask] = ray_samples[~mask]
        pts = mh.intervals_to_ray_points(intervals, d, o)
        bundle = renderer(model(pts, d[..., None, :].expand_as(pts)), intervals, d)
        if train:
            tree.ray_batch_integration(
                step, indices[mask], bundle.weights[mask].detach(),
                bundle.mask_weights[mask].detach(),
            )
        return bundle

    bo, bd, bt = batches
    voxel_counts = []
    t0 = time.time()
    for s in range(bo.shape[0]):
        o, d, t = map(torch.from_numpy, (bo[s], bd[s], bt[s]))
        opt.zero_grad()
        b = forward(o, d, True, s)
        loss = torch.nn.functional.mse_loss(b.rgb_map, t)
        loss.backward()
        opt.step()
        if tree.ticked(s):
            tree.consolidate()
            voxel_counts.append((s, int(tree.voxels.shape[0])))
        if s % 500 == 0:
            print(f"  torch buff step {s} loss {float(loss):.5f} "
                  f"V {int(tree.voxels.shape[0])}", flush=True)
    train_s = time.time() - t0

    renderer.eval(); model.eval()
    eo, ed, et = eval_set
    with torch.no_grad():
        mses = []
        for i in range(0, ed.shape[0], 1024):
            sl = slice(i, i + 1024)
            b = forward(torch.from_numpy(eo[sl]), torch.from_numpy(ed[sl]),
                        train=False, step=-1)
            mses.append(torch.nn.functional.mse_loss(
                b.rgb_map, torch.from_numpy(et[sl])).item())
    psnr = float(-10.0 * np.log10(np.mean(mses)))
    return {"psnr": psnr, "train_s": train_s, "voxel_counts": voxel_counts}


# ---------------------------------------------------------------------------
# Rebuild runners (scan-chunked so TPU runs don't pay per-step dispatch)
# ---------------------------------------------------------------------------

def _setup_jax(platform: str):
    import jax

    if platform == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    jax.config.update("jax_default_matmul_precision", "highest")
    return jax


def run_jax_hier(batches, eval_set, seed: int, platform: str) -> dict:
    jax = _setup_jax(platform)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nerfmeshes_tpu.models.nerf_models import FlexibleNeRFModel
    from nerfmeshes_tpu.ops.math import img2mse
    from nerfmeshes_tpu.train.render import RenderSettings, render_rays

    coarse = FlexibleNeRFModel(**ARCH)
    fine = FlexibleNeRFModel(**ARCH)
    pts = jnp.zeros((2, 2, 3))
    params = {
        "coarse": coarse.init(jax.random.key(seed * 2 + 1), pts, pts),
        "fine": fine.init(jax.random.key(seed * 2 + 2), pts, pts),
    }
    settings = RenderSettings(
        num_coarse=HIER_COARSE, num_fine=HIER_FINE, perturb=True,
        lindisp=False, radiance_field_noise_std=NOISE, white_background=False,
        use_fine=True, use_fused_kernel=False,
    )
    opt = optax.adam(LR)
    opt_state = opt.init(params)

    def loss_fn(p, o, d, t, key):
        cb, fb = render_rays(coarse, fine, p, o, d, NEAR, FAR, settings,
                             train=True, key=key)
        return img2mse(cb.rgb_map, t) + img2mse(fb.rgb_map, t)

    @jax.jit
    def run_chunk(p, s, o, d, t, keys):
        def body(carry, xs):
            p, s = carry
            o, d, t, key = xs
            loss, g = jax.value_and_grad(loss_fn)(p, o, d, t, key)
            updates, s = opt.update(g, s, p)
            return (optax.apply_updates(p, updates), s), loss

        (p, s), losses = jax.lax.scan(body, (p, s), (o, d, t, keys))
        return p, s, losses

    bo, bd, bt = batches
    base_key = jax.random.key(seed)
    n = bo.shape[0]
    chunk = 250
    t0 = time.time()
    for i in range(0, n, chunk):
        sl = slice(i, i + chunk)
        keys = jax.vmap(lambda j: jax.random.fold_in(base_key, j))(
            jnp.arange(i, min(i + chunk, n)))
        params, opt_state, losses = run_chunk(
            params, opt_state, jnp.asarray(bo[sl]), jnp.asarray(bd[sl]),
            jnp.asarray(bt[sl]), keys)
        print(f"  jax hier step {i + losses.shape[0]} "
              f"loss {float(losses[-1]):.5f}", flush=True)
    train_s = time.time() - t0

    @jax.jit
    def eval_rgb(p, o, d):
        cb, fb = render_rays(coarse, fine, p, o, d, NEAR, FAR, settings,
                             train=False)
        return cb.rgb_map, fb.rgb_map

    eo, ed, et = eval_set
    crgb, rgb = (np.asarray(x)
                 for x in eval_rgb(params, jnp.asarray(eo), jnp.asarray(ed)))
    psnr = float(-10.0 * np.log10(np.mean((rgb - et) ** 2)))
    coarse_psnr = float(-10.0 * np.log10(np.mean((crgb - et) ** 2)))
    return {"psnr": psnr, "coarse_psnr": coarse_psnr, "train_s": train_s}


def run_jax_buff(batches, eval_set, seed: int, platform: str) -> dict:
    jax = _setup_jax(platform)
    from functools import partial

    import jax.numpy as jnp
    import numpy as np
    import optax

    from nerfmeshes_tpu.buff.system import buff_render_rays
    from nerfmeshes_tpu.buff.tree import TreeSampling, integrate
    from nerfmeshes_tpu.config import get_default_cfg
    from nerfmeshes_tpu.models.nerf_models import FlexibleNeRFModel
    from nerfmeshes_tpu.ops.math import img2mse
    from nerfmeshes_tpu.train.render import RenderSettings

    cfg = get_default_cfg()
    for k, v in TREE.items():
        setattr(cfg.tree, k, v)
    cfg.dataset.near, cfg.dataset.far = NEAR, FAR

    model = FlexibleNeRFModel(**ARCH)
    pts = jnp.zeros((2, 2, 3))
    params = model.init(jax.random.key(seed * 2 + 1), pts, pts)
    settings = RenderSettings(
        num_coarse=BUFF_SAMPLES, num_fine=0, perturb=True, lindisp=False,
        radiance_field_noise_std=NOISE, white_background=False,
        use_fine=False, use_fused_kernel=False,
    )
    tree = TreeSampling(cfg)
    tree_state = tree.device_state()
    opt = optax.adam(LR)
    opt_state = opt.init(params)

    @partial(jax.jit, static_argnames=("integrate_from",))
    def run_chunk(p, s, ts, o, d, t, keys, steps, integrate_from):
        def body(carry, xs):
            p, s, ts = carry
            o, d, t, key, step = xs

            def loss_fn(p):
                bundle, vox, rmask, _ = buff_render_rays(
                    model, p, ts, o, d, NEAR, FAR, settings, train=True,
                    use_random_sampling=False, key=key,
                )
                return img2mse(bundle.rgb_map, t), (bundle, vox, rmask)

            (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            updates, s = opt.update(g, s, p)
            p = optax.apply_updates(p, updates)
            bundle, vox, rmask = aux
            ts2 = integrate(
                ts, vox, jax.lax.stop_gradient(bundle.weights),
                jax.lax.stop_gradient(bundle.mask_weights), rmask,
            )
            # Reference gate (tree.py:185): integrate from step >= offset.
            ts = jax.tree_util.tree_map(
                lambda a, b: jnp.where(step >= integrate_from, b, a), ts, ts2
            )
            return (p, s, ts), loss

        (p, s, ts), losses = jax.lax.scan(body, (p, s, ts), (o, d, t, keys, steps))
        return p, s, ts, losses

    bo, bd, bt = batches
    n = bo.shape[0]
    offset = TREE["step_size_integration_offset"]
    base_key = jax.random.key(seed)
    # Segment boundaries: consolidation happens after executing a ticked
    # step (model_buff.py:103-104), so each tick ends a segment.
    bounds = [0] + [s + 1 for s in _ticks(n)] + [n]
    voxel_counts = []
    t0 = time.time()
    for a, b in zip(bounds[:-1], bounds[1:]):
        for i in range(a, b, 250):
            j = min(i + 250, b)
            keys = jax.vmap(lambda k: jax.random.fold_in(base_key, k))(
                jnp.arange(i, j))
            params, opt_state, tree_state, losses = run_chunk(
                params, opt_state, tree_state, jnp.asarray(bo[i:j]),
                jnp.asarray(bd[i:j]), jnp.asarray(bt[i:j]), keys,
                jnp.arange(i, j), integrate_from=offset)
            print(f"  jax buff step {j} loss {float(losses[-1]):.5f}",
                  flush=True)
        if b <= n and (b - 1) in _ticks(n):
            tree_state = tree.consolidate(np.asarray(tree_state.memm))
            voxel_counts.append((b - 1, len(tree.leaves)))
            print(f"  jax buff consolidate @ {b - 1}: V={len(tree.leaves)}",
                  flush=True)
    train_s = time.time() - t0

    @jax.jit
    def eval_rgb(p, ts, o, d):
        bundle, _, _, _ = buff_render_rays(
            model, p, ts, o, d, NEAR, FAR, settings, train=False,
            use_random_sampling=False,
        )
        return bundle.rgb_map

    eo, ed, et = eval_set
    rgb = np.asarray(eval_rgb(params, tree_state, jnp.asarray(eo),
                              jnp.asarray(ed)))
    psnr = float(-10.0 * np.log10(np.mean((rgb - et) ** 2)))
    return {"psnr": psnr, "train_s": train_s, "voxel_counts": voxel_counts}


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

RUNNERS = {
    ("torch", "hier"): run_torch_hier,
    ("torch", "buff"): run_torch_buff,
    ("jax", "hier"): run_jax_hier,
    ("jax", "buff"): run_jax_buff,
}


def record(key: str, result: dict):
    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    data[key] = result
    OUT.write_text(json.dumps(data, indent=2))
    print(f"recorded {key}: {json.dumps(result)[:200]}", flush=True)


def summarize():
    import numpy as np

    data = json.loads(OUT.read_text())
    print(f"{'stack':8} {'system':6} {'seeds':16} {'psnr mean':>9}  per-seed")
    means = {}
    for stack in ("torch", "jax"):
        for system in ("hier", "buff"):
            rows = {int(k.split("_")[2]): v for k, v in data.items()
                    if k.startswith(f"{stack}_{system}_")
                    and len(k.split("_")) == 3}  # skip _s{C}x{F} probes
            if not rows:
                continue
            ps = [rows[s]["psnr"] for s in sorted(rows)]
            means[(stack, system)] = float(np.mean(ps))
            print(f"{stack:8} {system:6} {sorted(rows)!s:16} "
                  f"{np.mean(ps):9.2f}  {[round(p, 2) for p in ps]}")
    for stack in ("torch", "jax"):
        if (stack, "hier") in means and (stack, "buff") in means:
            gap = means[(stack, "hier")] - means[(stack, "buff")]
            print(f"{stack}: hier - buff = {gap:+.2f} dB")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", nargs=3, metavar=("STACK", "SYSTEM", "SEED"))
    ap.add_argument("--steps", type=int, default=STEPS)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--probe", type=int, default=0,
                    help="time N torch-buff steps and extrapolate")
    ap.add_argument("--summarize", action="store_true")
    ap.add_argument("--tree-offset", type=int, default=0,
                    help="override integration offset (smoke tests only)")
    ap.add_argument("--tree-sst", type=int, default=0,
                    help="override consolidation period (smoke tests only)")
    ap.add_argument("--no-record", action="store_true")
    ap.add_argument("--hier-samples", type=int, nargs=2, metavar=("C", "F"),
                    help="override coarse/fine sample counts (fine-vs-coarse "
                         "short-budget dynamics probe, r5)")
    args = ap.parse_args()
    if args.tree_offset:
        TREE["step_size_integration_offset"] = args.tree_offset
    if args.tree_sst:
        TREE["step_size_tree"] = args.tree_sst
    if args.hier_samples:
        global HIER_COARSE, HIER_FINE
        HIER_COARSE, HIER_FINE = args.hier_samples

    if args.summarize:
        summarize()
        return

    if args.probe:
        batches, eval_set = make_data(42, num_steps=args.probe)
        t0 = time.time()
        run_torch_buff(batches, (eval_set[0][:64], eval_set[1][:64],
                                 eval_set[2][:64]), 42)
        dt = time.time() - t0
        print(json.dumps({"probe_steps": args.probe, "wall_s": dt,
                          "est_full_run_s": dt / args.probe * STEPS}))
        return

    stack, system, seed = args.run[0], args.run[1], int(args.run[2])
    batches, eval_set = make_data(seed, num_steps=args.steps)
    runner = RUNNERS[(stack, system)]
    if stack == "jax":
        result = runner(batches, eval_set, seed, args.platform)
    else:
        result = runner(batches, eval_set, seed)
    result["steps"] = args.steps
    if args.no_record:
        print(json.dumps(result))
    else:
        key = f"{stack}_{system}_{seed}"
        if args.hier_samples:
            # Off-protocol probe (e.g. 64+128 short-budget dynamics):
            # suffixed key so the 3-seed protocol entries stay clean.
            key += f"_s{HIER_COARSE}x{HIER_FINE}"
        record(key, result)


if __name__ == "__main__":
    main()
