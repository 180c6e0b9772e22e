"""Benchmark harness: headline metric = training rays/sec/chip on the
nerf-synthetic-lego workload (2048 rays/step, 64 coarse + 128 fine samples,
two 8x256 FlexibleNeRF MLPs, Adam + exp-decay schedule) — the reference's
flagship config (config/nerf-synthetic-lego.yml:182-191).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the PyTorch reference measured on this host's
CPU via scripts/measure_reference_baseline.py (the reference repo publishes
no numbers and no GPU is present; see BASELINE.md). Extra detail metrics go
to stderr / bench_details.json.
"""

from __future__ import annotations

import json
import sys
import time


# Measured by scripts/measure_reference_baseline.py (reference torch code
# run in-place on this host's CPU, same workload). See BASELINE.md.
BASELINE_TRAIN_RAYS_PER_SEC = None  # filled after measurement; fallback below
_BASELINE_FILE = "BASELINE_MEASURED.json"


def _load_baseline() -> float | None:
    try:
        with open(_BASELINE_FILE) as fh:
            return float(json.load(fh)["train_rays_per_sec"])
    except Exception:
        return BASELINE_TRAIN_RAYS_PER_SEC


def _watchdog() -> None:
    """Run the real benchmark in a child with a timeout + one retry.

    The TPU tunnel's compile service occasionally wedges after a failed
    compile (a subsequent compile hangs on a futex forever; the same
    kernel compiles in seconds on a fresh process — see CLAUDE.md). The
    driver's benchmark record must survive that, so the parent re-execs
    itself and retries once if the child hangs or dies.

    Worse failure mode (seen r3): the tunnel RELAY process dies outright,
    after which every jax call hangs forever — retries wedge identically
    and would burn the full 2x900s here. Preflight the relay's listen
    port when the axon env is present and fail fast with a diagnostic."""
    import os
    import socket
    import subprocess

    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        try:
            socket.create_connection(("127.0.0.1", 8082), timeout=5).close()
        except OSError as exc:
            print(
                "bench: TPU tunnel relay port 8082 refuses connections "
                f"({exc!r}) — the relay process is dead and every jax call "
                "would hang; not launching the child. Restore the tunnel "
                "(driver-side) and rerun.",
                file=sys.stderr,
            )
            sys.exit(1)

    env = dict(os.environ, NERFMESHES_BENCH_CHILD="1")
    for attempt in range(2):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                stdout=subprocess.PIPE,
                timeout=900,
            )
            out = proc.stdout.decode()
            if proc.returncode == 0 and '"metric"' in out:
                sys.stdout.write(out)
                return
            print(f"bench child rc={proc.returncode}; retrying", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"bench child timed out (attempt {attempt + 1})", file=sys.stderr)
    sys.exit(1)


def _probe_network(timeout_s: float = 3.0) -> bool:
    """True if DNS + TCP egress works (checked each bench run; this
    environment has had zero egress every round so far).

    Runs in a daemon thread with a hard join timeout: socket's
    `timeout` only bounds the TCP connect, NOT getaddrinfo — a resolver
    that drops packets would otherwise stall the probe ~5s x attempts x
    hosts after the metrics are already computed."""
    import socket
    import threading

    hit = []

    def probe():
        for host in ("drive.google.com", "github.com"):
            try:
                with socket.create_connection((host, 443), timeout=timeout_s):
                    hit.append(True)
                    return
            except OSError:
                continue

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    # Generous join: worst case is 2 hosts x (slow-but-working DNS +
    # connect). A tighter bound would report a slow resolver as "no
    # egress" — and a false negative here hides the signal the probe
    # exists to raise (real datasets become fetchable).
    t.join(5 * timeout_s)
    return bool(hit)


# bf16 MXU peak per chip, by jax device_kind. v5e ("TPU v5 lite"):
# 197 TFLOP/s bf16 (394 int8 — measured slower than bf16 through Mosaic
# on this part; see CLAUDE.md). MFU fields are null on unknown hardware.
_BF16_PEAK_BY_KIND = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
}


def _flexible_mlp_flops(mcfg) -> tuple[float, float]:
    """(full, sigma_only) matmul FLOPs per evaluated point of a
    FlexibleNeRFModel (models/nerf_models.py:38 — mirrors the layer
    structure exactly: input layer, num_layers-1 hidden with PE-concat
    skip every skip_step, feat/alpha heads, view branch, rgb head).

    Counts 2*in*out per Dense (multiply+add on the MXU); elementwise
    (PE, relu, sigmoid) is excluded — it rides the VPU and is not the
    resource MFU measures."""
    h = int(mcfg.hidden_size)
    dim_x = 3 * (2 * int(mcfg.num_encoding_fn_xyz) + int(bool(mcfg.include_input_xyz)))
    dim_d = 3 * (2 * int(mcfg.num_encoding_fn_dir) + int(bool(mcfg.include_input_dir)))
    n_layers = int(mcfg.num_layers)
    skip = int(mcfg.skip_step)
    mults = dim_x * h
    for i in range(n_layers - 1):
        fan_in = h + (dim_x if (i % skip == 0 and i > 0 and i != n_layers - 1) else 0)
        mults += fan_in * h
    sigma = mults + h * 1
    if bool(mcfg.use_viewdirs):
        full = mults + h * h + h * 1 + (h + dim_d) * (h // 2) + (h // 2) * 3
    else:
        full = mults + h * 4
    return 2.0 * full, 2.0 * sigma


def _kernel_preflight(cfg, fine, params) -> dict:
    """Compile EVERY Pallas kernel variant on the live backend, early,
    and record ok/FAIL per variant (VERDICT r4 item 2b: the r4 chords
    kernel shipped having never compiled on hardware — a Mosaic
    verification failure must be loud here, never discovered by a
    crashed BuFF run). Off-TPU the kernels run interpreted, where Mosaic
    cannot fail; recorded as such."""
    import jax
    import jax.numpy as jnp

    from nerfmeshes_tpu.ops.pallas import chords as _chords
    from nerfmeshes_tpu.ops.pallas.fused_mlp import (
        fused_flexible_apply_rays,
        fused_sigma_points,
        supports_fused,
    )

    if jax.default_backend() != "tpu":
        return {"backend": jax.default_backend(), "note": "interpret-only"}

    out = {"backend": "tpu"}

    def leg(name, fn):
        try:
            jax.block_until_ready(fn())
            out[name] = "ok"
        except Exception as exc:
            out[name] = f"FAIL: {type(exc).__name__}: {exc}"[:300]
            print(f"kernel preflight FAILED [{name}]: {exc!r}", file=sys.stderr)

    o = jnp.zeros((256, 3), jnp.float32)
    d = jnp.ones((256, 3), jnp.float32)
    z = jnp.linspace(2.0, 6.0, 64)[None, :].repeat(256, axis=0)
    if supports_fused(fine):
        leg(
            "fused_mlp_fwd",
            lambda: fused_flexible_apply_rays(
                fine, params["fine"], o, d, z, inference=True
            ),
        )

        def bwd():
            loss = lambda p: jnp.sum(
                fused_flexible_apply_rays(fine, p, o, d, z)
            )
            return jax.grad(loss)(params["fine"])

        leg("fused_mlp_bwd", bwd)
        leg(
            "fused_sigma_only",
            lambda: fused_sigma_points(fine, params["fine"], o),
        )
    # Chords kernel at the shipped BuFF shape (V=1728 = 12^3 root grid,
    # K=64 auto cap) and the first auto-doubled cap. kernel_usable runs
    # the guarded compile probe itself — failures degrade to the XLA path
    # in production, but must be visible here.
    for V, K in ((1728, 64), (1728, 128)):
        name = f"chords_V{V}_K{K}"
        ok = _chords.kernel_usable(V, K)
        out[name] = "ok" if ok else "FAIL (kernel_usable probe; see warnings)"
        if not ok:
            print(f"kernel preflight FAILED [{name}]", file=sys.stderr)
    return out


def main() -> None:
    import jax

    from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from nerfmeshes_tpu.config import get_default_cfg
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
    from nerfmeshes_tpu.train.optim import build_optimizer
    from nerfmeshes_tpu.train.step import init_train_state, make_train_step
    from nerfmeshes_tpu.train.system import create_models, init_params

    cfg = get_default_cfg()
    cfg.experiment.compute_dtype = "bfloat16"
    cfg.experiment.steps_per_call = 20
    cfg.nerf.train.perturb = True
    cfg.dataset.type = "synthetic"

    # lego-shaped workload, synthetic targets at 800x800 (no dataset ships
    # with the reference; ray math + model are identical to the lego config).
    dataset = SyntheticDataset(cfg, DatasetType.TRAIN, num_images=4, image_size=800)
    data = dataset.device_arrays()
    H, W, focal = dataset.hwf

    coarse, fine = create_models(cfg)
    optimizer = build_optimizer(cfg)
    params = init_params(cfg, coarse, fine, jax.random.key(0))
    state = init_train_state(params, optimizer, seed=0)

    preflight = _kernel_preflight(cfg, fine, params)
    print(json.dumps({"kernel_preflight": preflight}), file=sys.stderr)

    train_fn = make_train_step(
        cfg, coarse, fine, optimizer, H=int(H), W=int(W), focal=float(focal)
    )

    # Warmup / compile.
    t0 = time.time()
    state, metrics = train_fn(state, data)
    jax.block_until_ready(metrics["train/loss"])
    compile_s = time.time() - t0

    # Timed run.
    steps_per_call = int(cfg.experiment.steps_per_call)
    rays_per_step = int(cfg.nerf.train.num_random_rays)
    n_calls = 15
    t0 = time.time()
    for _ in range(n_calls):
        state, metrics = train_fn(state, data)
    jax.block_until_ready(metrics["train/loss"])
    elapsed = time.time() - t0

    total_rays = n_calls * steps_per_call * rays_per_step
    rays_per_sec = total_rays / elapsed
    n_chips = jax.device_count()
    rays_per_sec_chip = rays_per_sec / n_chips

    baseline = _load_baseline()
    vs_baseline = rays_per_sec_chip / baseline if baseline else None

    # Side metrics (each guarded: a failure here must never cost the
    # headline metric line the driver parses).
    def _side(fn):
        try:
            return fn()
        except Exception as exc:  # pragma: no cover - defensive
            print(f"side metric failed: {exc!r}", file=sys.stderr)
            return None

    import numpy as _np

    rng = _np.random.default_rng(0)

    def _render_metric():
        from nerfmeshes_tpu.train.step import make_render_chunk

        render_chunk = make_render_chunk(cfg, coarse, fine)
        R_chunk = 16384
        d = rng.standard_normal((R_chunk, 3)).astype(_np.float32)
        d /= _np.linalg.norm(d, axis=-1, keepdims=True)
        o = jax.numpy.zeros((R_chunk, 3))
        d = jax.numpy.asarray(d)
        cb, fb = render_chunk(state.params, o, d, 2.0, 6.0)
        jax.block_until_ready(fb.rgb_map)
        t0 = time.time()
        for _ in range(10):
            cb, fb = render_chunk(state.params, o, d, 2.0, 6.0)
        jax.block_until_ready(fb.rgb_map)
        return 10 * R_chunk / (time.time() - t0)

    def _grid_metric():
        # The geometry half of mesh extraction: sigma-only grid eval with
        # coordinates synthesized on device (mesh/extract.py:_grid_eval).
        from nerfmeshes_tpu.ops.pallas.fused_mlp import (
            fused_sigma_points,
            supports_fused,
        )

        n_pts = 1048576
        jnp = jax.numpy

        # Loop-carried chaining (carry perturbs the grid origin): through
        # the TPU tunnel, block_until_ready on independent dispatches
        # under-reports; a data dependency forces honest timing.
        @jax.jit
        def grid_eval(p, carry):
            idx = jnp.arange(n_pts)
            nyz, nz = 128 * 128, 128
            pts = jnp.stack(
                [
                    (idx // nyz).astype(jnp.float32) / 64.0 - 1.0 + carry * 1e-12,
                    ((idx % nyz) // nz).astype(jnp.float32) / 64.0 - 1.0,
                    (idx % nz).astype(jnp.float32) / 64.0 - 1.0,
                ],
                axis=-1,
            )
            if supports_fused(fine):
                return fused_sigma_points(fine, p["fine"], pts)[0]
            return fine.apply(p["fine"], pts, pts)[0, 3]

        carry = grid_eval(state.params, jax.numpy.float32(0.0))
        jax.block_until_ready(carry)
        reps = 10
        t0 = time.time()
        for _ in range(reps):
            carry = grid_eval(state.params, carry)
        float(_np.asarray(carry))
        return reps * n_pts / (time.time() - t0)

    _buff_ctx: dict = {}

    def _buff_metric():
        # BuFF train throughput (the reference's novel component;
        # lego-shaped tree workload: 192 samples, <=1536 voxels).
        from nerfmeshes_tpu.config import load_config
        from nerfmeshes_tpu.buff.system import BuFFSystem

        bcfg = load_config("configs/buff-synthetic-lego.yml")
        bcfg.experiment.compute_dtype = "bfloat16"
        bcfg.experiment.steps_per_call = 20
        bcfg.dataset.type = "synthetic"
        bsystem = BuFFSystem(bcfg)
        bsystem.setup(
            SyntheticDataset(bcfg, DatasetType.TRAIN, num_images=4, image_size=800),
            None,
        )
        _buff_ctx["cfg"], _buff_ctx["system"] = bcfg, bsystem

        def buff_calls(n):
            m = None
            for _ in range(n):
                bsystem.state, m = bsystem._train_fn(bsystem.state, bsystem._data)
            jax.block_until_ready(m["train/loss"])

        buff_calls(1)
        t0 = time.time()
        buff_calls(5)
        return 5 * 20 * int(bcfg.nerf.train.num_random_rays) / (time.time() - t0)

    def _buff_sharded_ab():
        # VERDICT r4 item 3: the exact multi-chip BuFF program (shard_map +
        # pmean grads + psum voxel accumulators + the chords Pallas kernel
        # running per-device) on a 1-element mesh axis, timed against the
        # unsharded BuFF run above on the same chip.
        if "system" not in _buff_ctx:
            return None
        from nerfmeshes_tpu.buff.system import BuffCarry, make_buff_train_step
        from nerfmeshes_tpu.parallel.mesh import create_mesh, replicated

        bcfg, bsystem = _buff_ctx["cfg"], _buff_ctx["system"]
        m = create_mesh(jax.devices())
        bH, bW, bfocal = bsystem.train_dataset.hwf
        fn = make_buff_train_step(
            bcfg,
            bsystem.coarse,
            bsystem.optimizer,
            H=int(bH),
            W=int(bW),
            focal=float(bfocal),
            mesh=m,
            force_shard=True,
        )
        rep = replicated(m)
        p = init_params(bcfg, bsystem.coarse, None, jax.random.key(0))
        carry = BuffCarry(
            jax.device_put(init_train_state(p, bsystem.optimizer, seed=0), rep),
            jax.device_put(bsystem.tree.device_state(), rep),
        )
        data_r = jax.device_put(bsystem._data, rep)
        carry, mm = fn(carry, data_r)
        jax.block_until_ready(mm["train/loss"])
        t0 = time.time()
        for _ in range(5):
            carry, mm = fn(carry, data_r)
        jax.block_until_ready(mm["train/loss"])
        return 5 * 20 * int(bcfg.nerf.train.num_random_rays) / (time.time() - t0)

    def _sharded_ab():
        # VERDICT r3 item 2: the exact multi-chip program (shard_map +
        # axis_index key folding + pmean collectives) on a 1-element mesh
        # axis, timed against the unsharded run above on the same chip.
        # Pins a no-regression contract for the code a real slice runs.
        from nerfmeshes_tpu.parallel.mesh import create_mesh

        m = create_mesh(jax.devices())
        fn = make_train_step(
            cfg,
            coarse,
            fine,
            optimizer,
            H=int(H),
            W=int(W),
            focal=float(focal),
            mesh=m,
            force_shard=True,
        )
        # Fresh params/state: the unsharded loop donated the originals.
        # Both operands replicated over the mesh UP FRONT, exactly as
        # NeRFSystem._replicate does — an input committed to a single
        # device is resharded on every call (a no-op copy that costs
        # ~6-17x through the tunnel; scripts/diag_shardmap.py).
        from nerfmeshes_tpu.parallel.mesh import replicated

        p = init_params(cfg, coarse, fine, jax.random.key(0))
        s = jax.device_put(init_train_state(p, optimizer, seed=0), replicated(m))
        data_r = jax.device_put(data, replicated(m))
        s, mm = fn(s, data_r)
        jax.block_until_ready(mm["train/loss"])
        t0 = time.time()
        for _ in range(n_calls):
            s, mm = fn(s, data_r)
        jax.block_until_ready(mm["train/loss"])
        return total_rays / (time.time() - t0)

    render_rays_per_sec = _side(_render_metric)
    grid_pts_per_sec = _side(_grid_metric)
    buff_rays_per_sec = _side(_buff_metric)
    buff_sharded_rays_per_sec = _side(_buff_sharded_ab)
    sharded_rays_per_sec = _side(_sharded_ab)

    # Auditable MFU (VERDICT r3 item 4): analytic model matmul FLOPs vs
    # the chip's bf16 peak. Train counts fwd+bwd as 3x forward (the
    # standard convention; the fused kernel actually RECOMPUTES the
    # forward in its backward — remat — so hardware executes ~4/3 of the
    # counted FLOPs and true MXU occupancy is higher than train_mfu).
    coarse_fpp, _ = _flexible_mlp_flops(cfg.models.coarse)
    fine_fpp, fine_sigma_fpp = _flexible_mlp_flops(cfg.models.fine)
    n_coarse = int(cfg.nerf.train.num_coarse)
    n_total = n_coarse + int(cfg.nerf.train.num_fine)  # fine net sees merged z
    render_flops_per_ray = n_coarse * coarse_fpp + n_total * fine_fpp
    train_flops_per_step = rays_per_step * 3.0 * render_flops_per_ray
    peak = _BF16_PEAK_BY_KIND.get(jax.devices()[0].device_kind)

    def _mfu(flops_per_unit, units_per_sec):
        if peak is None or not units_per_sec:
            return None
        return round(flops_per_unit * units_per_sec / peak, 4)

    train_mfu = _mfu(train_flops_per_step, n_calls * steps_per_call / elapsed)
    render_mfu = _mfu(render_flops_per_ray, render_rays_per_sec)
    grid_mfu = _mfu(fine_sigma_fpp, grid_pts_per_sec)
    # BuFF MFU (VERDICT r4 item 5): single network, num_coarse samples/ray,
    # fwd+bwd=3x fwd — same convention as train_mfu.
    buff_mfu = None
    if "cfg" in _buff_ctx and buff_rays_per_sec:
        bcfg = _buff_ctx["cfg"]
        buff_fpp, _ = _flexible_mlp_flops(bcfg.models.coarse)
        buff_flops_per_ray = int(bcfg.nerf.train.num_coarse) * buff_fpp * 3.0
        buff_mfu = _mfu(buff_flops_per_ray, buff_rays_per_sec)

    details = {
        "device": str(jax.devices()[0]),
        "kernel_preflight": preflight,
        "n_chips": n_chips,
        "compile_s": compile_s,
        "steps_per_sec": n_calls * steps_per_call / elapsed,
        "train_rays_per_sec_total": rays_per_sec,
        "render_rays_per_sec": render_rays_per_sec,
        "buff_train_rays_per_sec": buff_rays_per_sec,
        "mesh_grid_pts_per_sec": grid_pts_per_sec,
        "mesh_480_grid_eval_est_s": (480**3) / grid_pts_per_sec
        if grid_pts_per_sec
        else None,
        "final_loss": float(metrics["train/loss"]),
        "baseline_train_rays_per_sec": baseline,
        "sharded_train_rays_per_sec": sharded_rays_per_sec,
        "sharded_vs_unsharded": round(sharded_rays_per_sec / rays_per_sec, 4)
        if sharded_rays_per_sec
        else None,
        "buff_sharded_train_rays_per_sec": buff_sharded_rays_per_sec,
        "buff_sharded_vs_unsharded": round(
            buff_sharded_rays_per_sec / buff_rays_per_sec, 4
        )
        if buff_sharded_rays_per_sec and buff_rays_per_sec
        else None,
        "train_mfu": train_mfu,
        "buff_mfu": buff_mfu,
        "render_mfu": render_mfu,
        "grid_mfu": grid_mfu,
        "mfu_bf16_peak_flops": peak,
        "mfu_formula": (
            "Dense matmul FLOPs only (2*in*out per layer, FlexibleNeRF "
            f"8x256 L_xyz=10 L_dir=4: full={fine_fpp:.0f}, "
            f"sigma_only={fine_sigma_fpp:.0f} FLOPs/pt); "
            f"render/ray = {n_coarse}*coarse_full + {n_total}*fine_full = "
            f"{render_flops_per_ray:.0f}; train/step = rays*3*render_ray "
            f"(fwd+bwd=3x fwd; the remat backward re-executes the forward, "
            "so hardware FLOPs ~ 4/3 of counted)"
        ),
        # Re-probed every bench run (VERDICT r2 item 9): if the network
        # ever appears, scripts/download_datasets.py + real-lego parity
        # become the immediate top priority next round.
        "network_available": _probe_network(),
    }
    print(json.dumps(details), file=sys.stderr)
    try:
        with open("bench_details.json", "w") as fh:
            json.dump(details, fh, indent=2)
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip_lego",
                "value": round(rays_per_sec_chip, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    import os

    if os.environ.get("NERFMESHES_BENCH_CHILD"):
        main()
    else:
        _watchdog()
