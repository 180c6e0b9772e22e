"""Fused FlexibleNeRF MLP as a Pallas TPU kernel.

The radiance MLP is the FLOP center of the framework, but at NeRF sizes
(393k points x 8 layers x 256 wide per step) XLA materializes every
inter-layer activation in HBM, leaving the MXU idle on bandwidth. This
kernel keeps the whole trunk + heads resident in VMEM per point-tile:

    HBM traffic per tile = PE inputs + 4-channel output (+ weights once),
    everything between runs MXU->VMEM->MXU.

Layout notes
- Skip/view concatenations are algebraically split into paired matmuls
  (x@W_x + pe@W_pe), so no in-kernel concat and every contraction is
  tile-aligned.
- feat and alpha heads share one matmul ([W_feat | W_alpha] columns) and
  are split at an aligned boundary.
- The backward kernel recomputes forward activations per tile (VMEM) and
  accumulates weight grads across the sequential TPU grid into single
  f32 outputs; input gradients are not produced (ray points/dirs never
  need them in training — depth samples are stop_gradient'ed upstream,
  reference: SamplePDF detaches, src/nerf/modules.py:201).
- PE is computed outside (cheap, bandwidth ~2% of what the fusion saves)
  so the same kernel serves every PE flavor.

Falls back to interpret mode off-TPU so tests run on the CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Any, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
TILE_BWD = 1024  # backward holds the (bf16) activation stash in VMEM


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_axis(x, size: int, axis: int):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


class MLPSpec(NamedTuple):
    """Static architecture of a FlexibleNeRFModel (viewdir variant)."""

    num_layers: int
    hidden: int
    skip_step: int
    pe_x: int  # unpadded xyz PE width
    pe_d: int  # unpadded dir PE width

    @property
    def pe_x_pad(self) -> int:
        return _round_up(self.pe_x, 128)

    @property
    def pe_d_pad(self) -> int:
        return _round_up(self.pe_d, 128)

    @property
    def skip_layers(self) -> Tuple[int, ...]:
        return tuple(
            i
            for i in range(self.num_layers - 1)
            if i % self.skip_step == 0 and i > 0 and i != self.num_layers - 1
        )

    @property
    def half(self) -> int:
        return self.hidden // 2


def params_to_flat(spec: MLPSpec, params: Any) -> List[jnp.ndarray]:
    """Flax FlexibleNeRFModel params -> padded flat weight list.

    Order of TorchLinear submodules in the flax module (models/nerf_models.py):
    0: layer1, 1..num_layers-1: trunk, then feat, alpha, dir, rgb.
    """
    p = params["params"] if "params" in params else params

    def get(i):
        leaf = p[f"TorchLinear_{i}"]
        # biases as (1, F): TPU VMEM wants >=2-D operands.
        return jnp.asarray(leaf["kernel"]), jnp.asarray(leaf["bias"])[None, :]

    flat: List[jnp.ndarray] = []
    bf16 = jnp.bfloat16

    # layer1: (pe_x, hidden)
    W, b = get(0)
    flat += [_pad_axis(W, spec.pe_x_pad, 0).astype(bf16), b.astype(jnp.float32)]
    # trunk layers
    for i in range(1, spec.num_layers):
        W, b = get(i)
        if (i - 1) in spec.skip_layers:
            Wx, Wpe = W[: spec.hidden], W[spec.hidden :]
            flat += [
                Wx.astype(bf16),
                _pad_axis(Wpe, spec.pe_x_pad, 0).astype(bf16),
                b.astype(jnp.float32),
            ]
        else:
            flat += [W.astype(bf16), b.astype(jnp.float32)]
    # feat & alpha fused: [W_feat | W_alpha_pad(128)]
    Wf, bf_ = get(spec.num_layers)
    Wa, ba = get(spec.num_layers + 1)
    Wfa = jnp.concatenate([Wf, _pad_axis(Wa, 128, 1)], axis=1)
    bfa = jnp.concatenate([bf_, _pad_axis(ba, 128, 1)], axis=1)
    flat += [Wfa.astype(bf16), bfa.astype(jnp.float32)]
    # dir layer: input (hidden + pe_d) -> half; split
    Wd, bd = get(spec.num_layers + 2)
    Wd_x, Wd_pe = Wd[: spec.hidden], Wd[spec.hidden :]
    half_pad = _round_up(spec.half, 128)
    flat += [
        _pad_axis(Wd_x, half_pad, 1).astype(bf16),
        _pad_axis(_pad_axis(Wd_pe, spec.pe_d_pad, 0), half_pad, 1).astype(bf16),
        _pad_axis(bd, half_pad, 1).astype(jnp.float32),
    ]
    # rgb head: (half, 3) -> pad cols to 128
    Wr, br = get(spec.num_layers + 3)
    flat += [
        _pad_axis(_pad_axis(Wr, half_pad, 0), 128, 1).astype(bf16),
        _pad_axis(br, 128, 1).astype(jnp.float32),
    ]
    return flat


def _forward_tile(spec: MLPSpec, pe_x, pe_d, ws: Sequence, *, save_acts=False):
    """Shared per-tile forward. ws is the flat weight list (values, not refs).
    Returns (out (T,4) f32, acts) where acts are pre-activation inputs of
    each trunk layer (bf16) when save_acts."""
    bf16 = jnp.bfloat16
    idx = 0

    def dot(a, W):
        return jax.lax.dot_general(
            a.astype(bf16),
            W,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acts = []

    def stash(v):
        # bf16 stash: halves the VMEM footprint of the backward recompute.
        acts.append(v.astype(bf16))

    W0, b0 = ws[idx], ws[idx + 1]
    idx += 2
    x = dot(pe_x, W0) + b0  # layer1: no activation before trunk layer 0
    for i in range(spec.num_layers - 1):
        if save_acts:
            stash(x)
        if i in spec.skip_layers:
            Wx, Wpe, b = ws[idx], ws[idx + 1], ws[idx + 2]
            idx += 3
            x = jax.nn.relu(dot(x, Wx) + dot(pe_x, Wpe) + b)
        else:
            W, b = ws[idx], ws[idx + 1]
            idx += 2
            x = jax.nn.relu(dot(x, W) + b)
    if save_acts:
        stash(x)  # trunk output (input of heads)

    Wfa, bfa = ws[idx], ws[idx + 1]
    idx += 2
    fa = dot(x, Wfa) + bfa
    feat = jax.nn.relu(fa[:, : spec.hidden])
    alpha = fa[:, spec.hidden : spec.hidden + 1]

    Wd_x, Wd_pe, bd = ws[idx], ws[idx + 1], ws[idx + 2]
    idx += 3
    h = jax.nn.relu(dot(feat, Wd_x) + dot(pe_d, Wd_pe) + bd)
    if save_acts:
        stash(fa)  # feat/alpha pre-activation
        stash(h)

    Wr, br = ws[idx], ws[idx + 1]
    rgb_full = jax.nn.sigmoid(dot(h, Wr) + br)
    out = jnp.concatenate([rgb_full[:, :3], alpha], axis=1)
    return out, acts


def _fwd_kernel(spec: MLPSpec, n_weights: int, *refs):
    pe_x_ref, pe_d_ref = refs[0], refs[1]
    w_refs = refs[2 : 2 + n_weights]
    out_ref = refs[2 + n_weights]
    ws = [r[:] for r in w_refs]
    out, _ = _forward_tile(spec, pe_x_ref[:], pe_d_ref[:], ws)
    out_ref[:] = out


def _bwd_kernel(spec: MLPSpec, n_weights: int, *refs):
    """Recompute forward; accumulate dW/db across the sequential grid.

    Accumulation runs in VMEM scratch (persistent across the sequential
    TPU grid) and flushes to the HBM outputs once, on the last step —
    read-modify-write of ~2.3MB of grads per grid step would otherwise
    ride HBM."""
    pe_x_ref, pe_d_ref, g_ref = refs[0], refs[1], refs[2]
    w_refs = refs[3 : 3 + n_weights]
    grad_refs = refs[3 + n_weights : 3 + 2 * n_weights]
    acc_refs = refs[3 + 2 * n_weights :]
    ws = [r[:] for r in w_refs]
    pe_x = pe_x_ref[:]
    pe_d = pe_d_ref[:]

    _, acts = _forward_tile(spec, pe_x, pe_d, ws, save_acts=True)

    def pos(v):
        # Mosaic has no bf16 vector compare; mask in f32.
        return (v.astype(jnp.float32) > 0).astype(jnp.float32)

    # acts: [trunk inputs x_0..x_{L-2}, trunk_out, fa_pre, h]
    n_trunk = spec.num_layers - 1
    trunk_in = acts[:n_trunk]
    trunk_out = acts[n_trunk]
    fa_pre = acts[n_trunk + 1]
    h = acts[n_trunk + 2]

    bf16 = jnp.bfloat16

    def dotT_ab(a, b):  # a^T @ b  -> (features_a, features_b) f32
        return jax.lax.dot_general(
            a.astype(bf16), b.astype(bf16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dot_bT(a, W):  # a @ W^T
        return jax.lax.dot_general(
            a.astype(bf16), W,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    g = g_ref[:]  # (T, 4) f32
    drgb, dalpha = g[:, :3], g[:, 3:4]

    # rgb head (sigmoid)
    idx_w = n_weights - 2  # Wr position in ws
    Wr = ws[idx_w]
    rgb_full = jax.nn.sigmoid(
        jax.lax.dot_general(h.astype(bf16), Wr,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + ws[idx_w + 1]
    )
    drgb_full = jnp.pad(drgb, ((0, 0), (0, 128 - 3)))
    drgb_pre = drgb_full * rgb_full * (1.0 - rgb_full)  # (T, 128)

    grads: List = [None] * n_weights
    grads[idx_w] = dotT_ab(h, drgb_pre)
    grads[idx_w + 1] = jnp.sum(drgb_pre, axis=0)
    dh = dot_bT(drgb_pre, Wr) * pos(h)

    # dir layer
    idx_w -= 3
    Wd_x, Wd_pe = ws[idx_w], ws[idx_w + 1]
    grads[idx_w] = dotT_ab(jax.nn.relu(fa_pre[:, : spec.hidden]), dh)
    grads[idx_w + 1] = dotT_ab(pe_d, dh)
    grads[idx_w + 2] = jnp.sum(dh, axis=0)
    dfeat = dot_bT(dh, Wd_x)  # (T, hidden)

    # feat/alpha fused head
    idx_w -= 2
    feat_mask = pos(fa_pre[:, : spec.hidden])
    dfa = jnp.concatenate(
        [dfeat * feat_mask, jnp.pad(dalpha, ((0, 0), (0, 128 - 1)))], axis=1
    )
    grads[idx_w] = dotT_ab(trunk_out, dfa)
    grads[idx_w + 1] = jnp.sum(dfa, axis=0)
    dx = dot_bT(dfa, ws[idx_w])  # (T, hidden)

    # trunk backwards
    for i in reversed(range(spec.num_layers - 1)):
        dx = dx * pos(trunk_out) if i == spec.num_layers - 2 else dx
        # post-activation grad for layer i output:
        x_in = trunk_in[i]
        if i in spec.skip_layers:
            idx_w -= 3
            Wx = ws[idx_w]
            grads[idx_w] = dotT_ab(x_in, dx)
            grads[idx_w + 1] = dotT_ab(pe_x, dx)
            grads[idx_w + 2] = jnp.sum(dx, axis=0)
            dx = dot_bT(dx, Wx)
        else:
            idx_w -= 2
            W = ws[idx_w]
            grads[idx_w] = dotT_ab(x_in, dx)
            grads[idx_w + 1] = jnp.sum(dx, axis=0)
            dx = dot_bT(dx, W)
        if i > 0:
            dx = dx * pos(trunk_in[i])
    # layer1 (no activation on its output)
    idx_w -= 2
    grads[idx_w] = dotT_ab(pe_x, dx)
    grads[idx_w + 1] = jnp.sum(dx, axis=0)
    assert idx_w == 0

    first = pl.program_id(0) == 0
    last = pl.program_id(0) == pl.num_programs(0) - 1
    for gref, acc, gval in zip(grad_refs, acc_refs, grads):
        gval = gval.reshape(acc.shape)

        @pl.when(first)
        def _(acc=acc, gval=gval):
            acc[...] = gval

        @pl.when(jnp.logical_not(first))
        def _(acc=acc, gval=gval):
            acc[...] = acc[...] + gval

        @pl.when(last)
        def _(gref=gref, acc=acc):
            gref[...] = acc[...]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_mlp(spec: MLPSpec, pe_x, pe_d, flat_weights):
    out, _ = _fused_mlp_fwd(spec, pe_x, pe_d, flat_weights)
    return out


def _pad_inputs(spec, pe_x, pe_d, tile=TILE):
    n = pe_x.shape[0]
    n_pad = _round_up(max(n, 1), tile)
    pe_x = _pad_axis(_pad_axis(pe_x, spec.pe_x_pad, 1), n_pad, 0).astype(jnp.bfloat16)
    pe_d = _pad_axis(_pad_axis(pe_d, spec.pe_d_pad, 1), n_pad, 0).astype(jnp.bfloat16)
    return pe_x, pe_d, n, n_pad


def _fused_mlp_fwd(spec: MLPSpec, pe_x, pe_d, flat_weights):
    pe_x_p, pe_d_p, n, n_pad = _pad_inputs(spec, pe_x, pe_d)
    n_w = len(flat_weights)
    grid = (n_pad // TILE,)

    in_specs = [
        pl.BlockSpec((TILE, spec.pe_x_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, spec.pe_d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_w)]

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, spec, n_w),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        interpret=_interpret(),
    )(pe_x_p, pe_d_p, *flat_weights)
    return out[:n], (pe_x, pe_d, flat_weights)


def _fused_mlp_bwd(spec: MLPSpec, residuals, g):
    pe_x, pe_d, flat_weights = residuals
    pe_x_p, pe_d_p, n, n_pad = _pad_inputs(spec, pe_x, pe_d, tile=TILE_BWD)
    g_p = _pad_axis(g.astype(jnp.float32), n_pad, 0)
    n_w = len(flat_weights)
    grid = (n_pad // TILE_BWD,)

    in_specs = [
        pl.BlockSpec((TILE_BWD, spec.pe_x_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_BWD, spec.pe_d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_BWD, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_w)]

    out_specs = []
    out_shapes = []
    for w in flat_weights:
        shape = w.shape
        out_specs.append(
            pl.BlockSpec(
                shape, lambda i, nd=len(shape): (0,) * nd, memory_space=pltpu.VMEM
            )
        )
        out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))

    scratch_shapes = [pltpu.VMEM(w.shape, jnp.float32) for w in flat_weights]
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, spec, n_w),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch_shapes,
        interpret=_interpret(),
    )(pe_x_p, pe_d_p, g_p, *flat_weights)

    zero_pe_x = jnp.zeros_like(pe_x)
    zero_pe_d = jnp.zeros_like(pe_d)
    return zero_pe_x, zero_pe_d, list(grads)


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def spec_from_model(model) -> MLPSpec:
    """MLPSpec from a FlexibleNeRFModel instance."""
    pe_x = 2 * 3 * model.num_encoding_fn_xyz + (3 if model.include_input_xyz else 0)
    pe_d = 2 * 3 * model.num_encoding_fn_dir + (3 if model.include_input_dir else 0)
    return MLPSpec(
        num_layers=model.num_layers,
        hidden=model.hidden_size,
        skip_step=model.skip_step,
        pe_x=pe_x,
        pe_d=pe_d,
    )


def supports_fused(model) -> bool:
    """The kernel covers the viewdir FlexibleNeRFModel family (every shipped
    reference config); other zoo members fall back to the XLA path."""
    from nerfmeshes_tpu.models.nerf_models import FlexibleNeRFModel

    return (
        isinstance(model, FlexibleNeRFModel)
        and model.use_viewdirs
        and model.hidden_size % 128 == 0
    )


def _pe_padded(x, num_fn, include_input, log_sampling, width: int):
    """Positional encoding emitted directly at the lane-padded width in
    bf16 — avoids the separate pad-copy + convert passes the profiler
    showed around the kernel."""
    from nerfmeshes_tpu.ops.encoding import frequency_bands

    bands = jnp.asarray(frequency_bands(num_fn, log_sampling), dtype=x.dtype)
    scaled = (x[..., None] * bands).reshape(*x.shape[:-1], -1)
    parts = [x] if include_input else []
    parts += [jnp.sin(scaled), jnp.cos(scaled)]
    used = sum(p.shape[-1] for p in parts)
    if width > used:
        parts.append(jnp.zeros((*x.shape[:-1], width - used), x.dtype))
    return jnp.concatenate(parts, axis=-1).astype(jnp.bfloat16)


def fused_flexible_apply(model, params, ray_points, ray_directions):
    """Drop-in for model.apply(params, points, dirs) on a FlexibleNeRFModel,
    through the fused kernel. Differentiable w.r.t. params (padding/cast in
    params_to_flat are linear, so autodiff maps kernel weight-grads back to
    the flax tree).

    ray_directions may have one fewer batch dim than ray_points (per-ray
    dirs): the dir PE is then computed per ray and broadcast per sample —
    sin/cos on R rows instead of R*S."""
    spec = spec_from_model(model)
    pts = ray_points.reshape(-1, 3)
    pe_x = _pe_padded(
        pts, model.num_encoding_fn_xyz, model.include_input_xyz,
        model.log_sampling_xyz, spec.pe_x_pad,
    )
    if ray_directions.ndim == ray_points.ndim - 1:
        pe_d_rays = _pe_padded(
            ray_directions.reshape(-1, 3), model.num_encoding_fn_dir,
            model.include_input_dir, model.log_sampling_dir, spec.pe_d_pad,
        )
        samples = ray_points.shape[-2]
        pe_d = jnp.broadcast_to(
            pe_d_rays[:, None, :], (pe_d_rays.shape[0], samples, spec.pe_d_pad)
        ).reshape(-1, spec.pe_d_pad)
    else:
        pe_d = _pe_padded(
            ray_directions.reshape(-1, 3), model.num_encoding_fn_dir,
            model.include_input_dir, model.log_sampling_dir, spec.pe_d_pad,
        )
    flat = params_to_flat(spec, params)
    out = fused_mlp(spec, pe_x, pe_d, flat)
    return out.reshape(*ray_points.shape[:-1], 4)
