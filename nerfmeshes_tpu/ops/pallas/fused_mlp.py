"""Fused FlexibleNeRF MLP as a Pallas TPU kernel — PE included.

The radiance MLP is the FLOP center of the framework, but at NeRF sizes
(393k points x 8 layers x 256 wide per step) XLA materializes every
inter-layer activation in HBM, leaving the MXU idle on bandwidth. This
kernel keeps the whole pipeline — positional encoding, trunk, skip
connection, view-conditioned heads — resident in VMEM per point-tile:

    HBM traffic per tile = raw points + dirs (8 f32 lanes each) and the
    4-channel output (+ weights once); everything between runs
    MXU->VMEM->MXU.

Layout notes
- The positional encoding is computed in-kernel: s = pts @ B (f32 matmul
  against the constant frequency matrix), then sin/cos on the VPU. Every
  PE *consumer* (layer1, the skip layer, the view head) is algebraically
  split into three matmuls (x@W_inp + sin@W_sin + cos@W_cos), so the PE
  vector is never assembled — no lane concats, every contraction aligned.
- feat and alpha heads share one matmul ([W_feat | W_alpha] columns).
- The backward kernel recomputes activations per tile (bf16 stash) and
  accumulates weight grads across the sequential grid (constant-index
  output blocks stay VMEM-resident); input gradients are not produced (ray points/dirs never
  need them in training — depth samples are stop_gradient'ed upstream,
  reference: SamplePDF detaches, src/nerf/modules.py:201).

Falls back to interpret mode off-TPU so tests run on the CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Any, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
PTS_W = 8  # raw xyz/dir inputs padded to 8 f32 lanes


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
    """Static architecture + PE config of a FlexibleNeRFModel (viewdirs)."""

    num_layers: int
    hidden: int
    skip_step: int
    L_x: int  # xyz PE bands
    L_d: int  # dir PE bands
    include_x: bool
    include_d: bool
    log_x: bool
    log_d: bool

    @property
    def sx(self) -> int:  # xyz PE projection width
        return 3 * self.L_x

    @property
    def sd(self) -> int:
        return 3 * self.L_d

    # external-PE (training path) widths
    @property
    def pe_x(self) -> int:
        return 2 * self.sx + (3 if self.include_x else 0)

    @property
    def pe_d(self) -> int:
        return 2 * self.sd + (3 if self.include_d else 0)

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


def _freq_matrix(L: int, log_sampling: bool) -> np.ndarray:
    """B (PTS_W, 3L) with B[d, d*L + l] = f_l: pts @ B reproduces the
    reference PE ordering (per input dim, frequencies contiguous)."""
    from nerfmeshes_tpu.ops.encoding import frequency_bands

    bands = frequency_bands(L, log_sampling)
    B = np.zeros((PTS_W, 3 * L), np.float32)
    for d in range(3):
        B[d, d * L : (d + 1) * L] = bands
    return B


def _split_pe_consumer(spec: MLPSpec, W, include_input: bool, s_width: int):
    """Split a PE-consuming weight (pe_width, out) into the
    (W_inp (PTS_W,out), W_sin (S,out), W_cos (S,out)) triple."""
    out = W.shape[1]
    off = 3 if include_input else 0
    if include_input:
        W_inp = _pad_axis(W[:3], PTS_W, 0)
    else:
        W_inp = jnp.zeros((PTS_W, out), W.dtype)
    W_sin = W[off : off + s_width]
    W_cos = W[off + s_width : off + 2 * s_width]
    return W_inp, W_sin, W_cos


def _params_to_flat_triple(spec: MLPSpec, params: Any) -> List[jnp.ndarray]:
    """Flax FlexibleNeRFModel params -> padded flat weight list.

    Order of TorchLinear submodules in the flax module (models/nerf_models.py):
    0: layer1, 1..num_layers-1: trunk, then feat, alpha, dir, rgb.
    PE-consuming weights are split into (inp, sin, cos) triples so the
    kernel never assembles a PE vector.
    """
    p = params["params"] if "params" in params else params

    def get(i):
        leaf = p[f"TorchLinear_{i}"]
        # biases as (1, F): TPU VMEM wants >=2-D operands.
        return jnp.asarray(leaf["kernel"]), jnp.asarray(leaf["bias"])[None, :]

    flat: List[jnp.ndarray] = []
    bf16 = jnp.bfloat16

    def put_pe_triple(W, include_input, s_width):
        Wi, Ws, Wc = _split_pe_consumer(spec, W, include_input, s_width)
        flat.extend([Wi.astype(bf16), Ws.astype(bf16), Wc.astype(bf16)])

    # layer1: consumes PE(xyz)
    W, b = get(0)
    put_pe_triple(W, spec.include_x, spec.sx)
    flat.append(b.astype(jnp.float32))
    # trunk layers
    for i in range(1, spec.num_layers):
        W, b = get(i)
        if (i - 1) in spec.skip_layers:
            Wx, Wpe = W[: spec.hidden], W[spec.hidden :]
            flat.append(Wx.astype(bf16))
            put_pe_triple(Wpe, spec.include_x, spec.sx)
            flat.append(b.astype(jnp.float32))
        else:
            flat += [W.astype(bf16), b.astype(jnp.float32)]
    # feat & alpha fused: [W_feat | W_alpha_pad(128)]
    Wf, bf_ = get(spec.num_layers)
    Wa, ba = get(spec.num_layers + 1)
    Wfa = jnp.concatenate([Wf, _pad_axis(Wa, 128, 1)], axis=1)
    bfa = jnp.concatenate([bf_, _pad_axis(ba, 128, 1)], axis=1)
    flat += [Wfa.astype(bf16), bfa.astype(jnp.float32)]
    # dir layer: input (hidden + pe_d) -> half; feat part + PE(dir) triple
    Wd, bd = get(spec.num_layers + 2)
    Wd_x, Wd_pe = Wd[: spec.hidden], Wd[spec.hidden :]
    half_pad = _round_up(spec.half, 128)
    flat.append(_pad_axis(Wd_x, half_pad, 1).astype(bf16))
    Wi, Ws, Wc = _split_pe_consumer(
        spec, _pad_axis(Wd_pe, half_pad, 1), spec.include_d, spec.sd
    )
    flat.extend([Wi.astype(bf16), Ws.astype(bf16), Wc.astype(bf16)])
    flat.append(_pad_axis(bd, half_pad, 1).astype(jnp.float32))
    # rgb head: (half, 3) -> pad cols to 128
    Wr, br = get(spec.num_layers + 3)
    flat += [
        _pad_axis(_pad_axis(Wr, half_pad, 0), 128, 1).astype(bf16),
        _pad_axis(br, 128, 1).astype(jnp.float32),
    ]
    return flat


def _dot(a, W):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        W,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_f32(a, B):
    """f32 contraction for the PE projection (phase needs full precision)."""
    return jax.lax.dot_general(
        a, B, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _forward_tile(spec: MLPSpec, pts, dirs, ws: Sequence, B_x, B_d, *, save_acts=False):
    """Shared per-tile forward over raw inputs pts/dirs (T, PTS_W) f32.

    Returns (out (T,4) f32, acts) where acts (bf16) are the trunk-layer
    inputs + head intermediates when save_acts."""
    bf16 = jnp.bfloat16
    idx = 0

    # In-kernel positional encoding: f32 projection (phase precision), then
    # VPU sin/cos, consumed as bf16 matmul operands.
    s_x = _dot_f32(pts, B_x)
    sin_x = jnp.sin(s_x).astype(bf16)
    cos_x = jnp.cos(s_x).astype(bf16)
    s_d = _dot_f32(dirs, B_d)
    sin_d = jnp.sin(s_d).astype(bf16)
    cos_d = jnp.cos(s_d).astype(bf16)
    x_in = pts.astype(bf16)
    d_in = dirs.astype(bf16)

    def pe_dot_x(Wi, Wsin, Wcos):
        return _dot(x_in, Wi) + _dot(sin_x, Wsin) + _dot(cos_x, Wcos)

    acts = []

    def stash(v):
        # bf16 stash: halves the VMEM footprint of the backward recompute.
        acts.append(v.astype(bf16))

    Wi0, Ws0, Wc0, b0 = ws[idx], ws[idx + 1], ws[idx + 2], ws[idx + 3]
    idx += 4
    x = pe_dot_x(Wi0, Ws0, Wc0) + b0  # layer1: linear (no relu before trunk)
    for i in range(spec.num_layers - 1):
        if save_acts:
            stash(x)
        if i in spec.skip_layers:
            Wx, Wi, Wsn, Wcs, b = ws[idx], ws[idx + 1], ws[idx + 2], ws[idx + 3], ws[idx + 4]
            idx += 5
            x = jax.nn.relu(_dot(x, Wx) + pe_dot_x(Wi, Wsn, Wcs) + b)
        else:
            W, b = ws[idx], ws[idx + 1]
            idx += 2
            x = jax.nn.relu(_dot(x, W) + b)
    if save_acts:
        stash(x)  # trunk output (input of heads)

    Wfa, bfa = ws[idx], ws[idx + 1]
    idx += 2
    fa = _dot(x, Wfa) + bfa
    feat = jax.nn.relu(fa[:, : spec.hidden])
    alpha = fa[:, spec.hidden : spec.hidden + 1]

    Wd_x, Wd_i, Wd_s, Wd_c, bd = (
        ws[idx], ws[idx + 1], ws[idx + 2], ws[idx + 3], ws[idx + 4]
    )
    idx += 5
    h = jax.nn.relu(
        _dot(feat, Wd_x) + _dot(d_in, Wd_i) + _dot(sin_d, Wd_s) + _dot(cos_d, Wd_c) + bd
    )
    if save_acts:
        stash(fa)  # feat/alpha pre-activation
        stash(h)

    Wr, br = ws[idx], ws[idx + 1]
    rgb_full = jax.nn.sigmoid(_dot(h, Wr) + br)
    out = jnp.concatenate([rgb_full[:, :3], alpha], axis=1)
    pe_vals = (x_in, sin_x, cos_x, d_in, sin_d, cos_d)
    return out, acts, pe_vals


def _fwd_kernel(spec: MLPSpec, n_weights: int, *refs):
    pts_ref, dirs_ref, bx_ref, bd_ref = refs[0], refs[1], refs[2], refs[3]
    w_refs = refs[4 : 4 + n_weights]
    out_ref = refs[4 + n_weights]
    ws = [r[:] for r in w_refs]
    out, _, _ = _forward_tile(
        spec, pts_ref[:], dirs_ref[:], ws, bx_ref[:], bd_ref[:]
    )
    out_ref[:] = out


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def fused_mlp_infer(spec: MLPSpec, pts, dirs, flat_weights):
    """Forward-only in-kernel-PE variant (render/eval/mesh paths): raw
    points in, no PE arrays materialized. Not differentiable — training
    goes through fused_mlp_train."""
    out, _ = _fused_mlp_fwd(spec, pts, dirs, flat_weights)
    return jax.lax.stop_gradient(out)


def _pad_inputs(pts, dirs, tile):
    n = pts.shape[0]
    n_pad = _round_up(max(n, 1), tile)
    pts = _pad_axis(_pad_axis(pts.astype(jnp.float32), PTS_W, 1), n_pad, 0)
    dirs = _pad_axis(_pad_axis(dirs.astype(jnp.float32), PTS_W, 1), n_pad, 0)
    return pts, dirs, n, n_pad


def _fused_mlp_fwd(spec: MLPSpec, pts, dirs, flat_weights):
    pts_p, dirs_p, n, n_pad = _pad_inputs(pts, dirs, TILE)
    n_w = len(flat_weights)
    grid = (n_pad // TILE,)
    B_x = jnp.asarray(_freq_matrix(spec.L_x, spec.log_x))
    B_d = jnp.asarray(_freq_matrix(spec.L_d, spec.log_d))

    in_specs = [
        pl.BlockSpec((TILE, PTS_W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, PTS_W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_w)]

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, spec, n_w),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        interpret=_interpret(),
    )(pts_p, dirs_p, B_x, B_d, *flat_weights)
    return out[:n], (pts, dirs, flat_weights)




def spec_from_model(model) -> MLPSpec:
    """MLPSpec from a FlexibleNeRFModel instance."""
    return MLPSpec(
        num_layers=model.num_layers,
        hidden=model.hidden_size,
        skip_step=model.skip_step,
        L_x=model.num_encoding_fn_xyz,
        L_d=model.num_encoding_fn_dir,
        include_x=model.include_input_xyz,
        include_d=model.include_input_dir,
        log_x=model.log_sampling_xyz,
        log_d=model.log_sampling_dir,
    )


def supports_fused(model) -> bool:
    """The kernel covers the viewdir FlexibleNeRFModel family (every shipped
    reference config); other zoo members fall back to the XLA path."""
    from nerfmeshes_tpu.models.nerf_models import FlexibleNeRFModel

    return (
        isinstance(model, FlexibleNeRFModel)
        and model.use_viewdirs
        and model.hidden_size % 128 == 0
        and model.num_encoding_fn_xyz > 0
        and model.num_encoding_fn_dir > 0
    )


def _pe_padded(x, num_fn, include_input, log_sampling, width: int):
    """Positional encoding emitted directly at the lane-padded width in
    bf16 (training path; the inference kernel encodes in-kernel)."""
    from nerfmeshes_tpu.ops.encoding import frequency_bands

    bands = jnp.asarray(frequency_bands(num_fn, log_sampling), dtype=x.dtype)
    scaled = (x[..., None] * bands).reshape(*x.shape[:-1], -1)
    parts = [x] if include_input else []
    parts += [jnp.sin(scaled), jnp.cos(scaled)]
    used = sum(p.shape[-1] for p in parts)
    if width > used:
        parts.append(jnp.zeros((*x.shape[:-1], width - used), x.dtype))
    return jnp.concatenate(parts, axis=-1).astype(jnp.bfloat16)


def fused_flexible_apply(model, params, ray_points, ray_directions, *, inference=False):
    """Drop-in for model.apply(params, points, dirs) on a FlexibleNeRFModel.

    Two kernel paths:
    - training (default): PE computed outside at padded width, custom-vjp
      kernel pair with the large-tile backward (fastest fwd+bwd);
    - inference=True: raw points in, PE fused into the kernel — no PE
      arrays ever materialize (+30% render throughput); forward-only.

    ray_directions may have one fewer batch dim than ray_points (per-ray
    dirs): encoded/broadcast once per ray."""
    spec = spec_from_model(model)
    pts = ray_points.reshape(-1, 3)
    per_ray_dirs = ray_directions.ndim == ray_points.ndim - 1
    samples = ray_points.shape[-2] if per_ray_dirs else None

    if inference:
        if per_ray_dirs:
            dirs = jnp.broadcast_to(
                ray_directions[..., None, :],
                (*ray_directions.shape[:-1], samples, 3),
            ).reshape(-1, 3)
        else:
            dirs = ray_directions.reshape(-1, 3)
        flat = _params_to_flat_triple(spec, params)
        out = fused_mlp_infer(spec, pts, dirs, flat)
        return out.reshape(*ray_points.shape[:-1], 4)

    pe_x = _pe_padded(
        pts, model.num_encoding_fn_xyz, model.include_input_xyz,
        model.log_sampling_xyz, spec.pe_x_pad,
    )
    if per_ray_dirs:
        pe_d_rays = _pe_padded(
            ray_directions.reshape(-1, 3), model.num_encoding_fn_dir,
            model.include_input_dir, model.log_sampling_dir, spec.pe_d_pad,
        )
        pe_d = jnp.broadcast_to(
            pe_d_rays[:, None, :], (pe_d_rays.shape[0], samples, spec.pe_d_pad)
        ).reshape(-1, spec.pe_d_pad)
    else:
        pe_d = _pe_padded(
            ray_directions.reshape(-1, 3), model.num_encoding_fn_dir,
            model.include_input_dir, model.log_sampling_dir, spec.pe_d_pad,
        )
    flat = _params_to_flat_ext(spec, params)
    out = fused_mlp_train(spec, pe_x, pe_d, flat)
    return out.reshape(*ray_points.shape[:-1], 4)


# ------------------------------------------------------------------------
# Training path: external-PE kernels (large-tile backward).
# ------------------------------------------------------------------------
TILE_BWD_EXT = 1024

def _params_to_flat_ext(spec: MLPSpec, params: Any) -> List[jnp.ndarray]:
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


def _forward_tile_ext(spec: MLPSpec, pe_x, pe_d, ws: Sequence, *, save_acts=False):
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


def _fwd_kernel_ext(spec: MLPSpec, n_weights: int, *refs):
    pe_x_ref, pe_d_ref = refs[0], refs[1]
    w_refs = refs[2 : 2 + n_weights]
    out_ref = refs[2 + n_weights]
    ws = [r[:] for r in w_refs]
    out, _ = _forward_tile_ext(spec, pe_x_ref[:], pe_d_ref[:], ws)
    out_ref[:] = out


def _bwd_kernel_ext(spec: MLPSpec, n_weights: int, *refs):
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

    _, acts = _forward_tile_ext(spec, pe_x, pe_d, ws, save_acts=True)

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_mlp_train(spec: MLPSpec, pe_x, pe_d, flat_weights):
    out, _ = _fused_mlp_train_fwd(spec, pe_x, pe_d, flat_weights)
    return out


def _pad_inputs_ext(spec, pe_x, pe_d, tile=TILE):
    n = pe_x.shape[0]
    n_pad = _round_up(max(n, 1), tile)
    pe_x = _pad_axis(_pad_axis(pe_x, spec.pe_x_pad, 1), n_pad, 0).astype(jnp.bfloat16)
    pe_d = _pad_axis(_pad_axis(pe_d, spec.pe_d_pad, 1), n_pad, 0).astype(jnp.bfloat16)
    return pe_x, pe_d, n, n_pad


def _fused_mlp_train_fwd(spec: MLPSpec, pe_x, pe_d, flat_weights):
    pe_x_p, pe_d_p, n, n_pad = _pad_inputs_ext(spec, pe_x, pe_d)
    n_w = len(flat_weights)
    grid = (n_pad // TILE,)

    in_specs = [
        pl.BlockSpec((TILE, spec.pe_x_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, spec.pe_d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_w)]

    out = pl.pallas_call(
        functools.partial(_fwd_kernel_ext, spec, n_w),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        interpret=_interpret(),
    )(pe_x_p, pe_d_p, *flat_weights)
    return out[:n], (pe_x, pe_d, flat_weights)


def _fused_mlp_train_bwd(spec: MLPSpec, residuals, g):
    pe_x, pe_d, flat_weights = residuals
    pe_x_p, pe_d_p, n, n_pad = _pad_inputs_ext(spec, pe_x, pe_d, tile=TILE_BWD_EXT)
    g_p = _pad_axis(g.astype(jnp.float32), n_pad, 0)
    n_w = len(flat_weights)
    grid = (n_pad // TILE_BWD_EXT,)

    in_specs = [
        pl.BlockSpec((TILE_BWD_EXT, spec.pe_x_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_BWD_EXT, spec.pe_d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_BWD_EXT, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
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
        functools.partial(_bwd_kernel_ext, spec, n_w),
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


fused_mlp_train.defvjp(_fused_mlp_train_fwd, _fused_mlp_train_bwd)
