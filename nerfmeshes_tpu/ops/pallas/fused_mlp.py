"""Fused FlexibleNeRF MLP as a Pallas TPU kernel — PE included.

The radiance MLP is the FLOP center of the framework, but at NeRF sizes
(393k points x 8 layers x 256 wide per step) XLA materializes every
inter-layer activation in HBM, leaving the MXU idle on bandwidth. This
kernel keeps the whole pipeline — positional encoding, trunk, skip
connection, view-conditioned heads — resident in VMEM per point-tile.

Layout design (the pallas {1,0}-layout boundary is the governing
constraint: any kernel operand/output with a small minor dim is
physically lane-padded to 128 in HBM, 16-40x its logical size):
- INPUT is ONE packed (PTS_W=8, N) f32 array — rows [x,y,z,dx,dy,dz,1,0]
  (pack_rays builds it straight from o/d/z without an (R,S,3) points
  array; row 6's ones carry the phase column). Lane-dense: 32B/point.
- The positional encoding is assembled inside the kernel on the VPU,
  TRANSPOSED: pe_t (comb_width, T) = one sin pass over outer-product
  broadcasts of the packed rows against per-lane frequency columns
  (_pe_lane_consts; exact f32 multiplies — for log sampling the bands
  are powers of two). cos rides the same sin via a +quarter-turn phase,
  and the sine itself is a 9-op wrap+minimax polynomial (_sin2pi) —
  jnp.sin's general range reduction costs ~3x more. xyz and dir encodings
  share the single 128-lane vector (dir block at d_off); each consumer's
  weight rows are zero outside its block, so every PE matmul contracts
  the full K=128 exactly as an external-PE kernel would — zero extra MXU
  work. dot_general contracts pe_t over dim 0: no transposes anywhere.
- OUTPUT is channels-first (4, N) f32: the rgb and alpha heads are
  computed transposed ((3,T)/(1,T) via dimension_numbers), and
  volume_render consumes the field channels_first — a channel-minor
  (N, 4) field would be 32x its logical size physically.
- The backward kernel recomputes activations per tile (bf16 stash) and
  accumulates weight grads across the sequential grid in VMEM scratch,
  flushing to HBM once on the last step; input gradients are not
  produced (ray points/dirs never need them in training — depth samples
  are stop_gradient'ed upstream, reference: SamplePDF detaches,
  src/nerf/modules.py:201).

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

TILE = 4096
TILE_BWD = 2048
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

    @property
    def pe_x(self) -> int:
        return 2 * self.sx + (3 if self.include_x else 0)

    @property
    def pe_d(self) -> int:
        return 2 * self.sd + (3 if self.include_d else 0)

    @property
    def d_off(self) -> int:
        """Lane offset of the dir-PE block in the combined PE vector."""
        return _round_up(self.pe_x, 64)

    @property
    def comb_width(self) -> int:
        """Width of the combined [pe_x | pe_d] vector (lane-padded)."""
        return _round_up(self.d_off + self.pe_d, 128)

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


def _pe_lane_consts(spec: MLPSpec) -> np.ndarray:
    """(comb_width, 16) per-lane constants for the combined PE vector.

    Column c (c=0..6) is the coefficient of packed-input row c in the
    sin argument of each lane: cols 0-2 xyz frequencies, cols 3-5 dir
    frequencies, col 6 the phase (the packed row 6 is all-ones, so the
    +quarter-turn cos phase rides the same fused multiply-add); raw
    input lanes have a 1.0 passthrough in their dim's column instead.
    Col 8 is the sin-lane mask (0 on raw lanes). The lane layout is
    [x?(3), sin_x(3Lx), cos_x(3Lx) | @d_off: d?(3), sin_d(3Ld),
    cos_d(3Ld) | pad] with the reference's d-major PE ordering
    (src/nerf/modules.py:8-37); unused lanes are all-zero so the sine
    polynomial writes exact zeros there."""
    from nerfmeshes_tpu.ops.encoding import frequency_bands

    c = np.zeros((spec.comb_width, 16), np.float32)

    def fill(col0, L, log_sampling, include_input, base):
        # Frequencies in TURNS (f/2pi): the kernel's sine is a polynomial
        # in the wrapped turn fraction, so the 1/2pi scale bakes in here.
        bands = frequency_bands(L, log_sampling) / (2 * np.pi)
        off = base + (3 if include_input else 0)
        for d in range(3):
            c[off + d * L : off + (d + 1) * L, col0 + d] = bands
            c[off + 3 * L + d * L : off + 3 * L + (d + 1) * L, col0 + d] = bands
        c[off + 3 * L : off + 6 * L, 6] = 0.25  # cos = sin a quarter turn on
        c[off : off + 6 * L, 8] = 1.0  # sin-lane mask
        if include_input:
            for d in range(3):
                c[base + d, col0 + d] = 1.0  # raw passthrough, mask stays 0

    fill(0, spec.L_x, spec.log_x, spec.include_x, 0)
    fill(3, spec.L_d, spec.log_d, spec.include_d, spec.d_off)
    return c


def _sin2pi(t_raw):
    """sin(2*pi*t_raw) via wrap-to-[-0.5,0.5] + odd minimax polynomial
    (max abs err ~1.2e-5 — far below the bf16 consumer's resolution).
    ~9 VPU ops vs the ~30+ of a general-range jnp.sin."""
    t = t_raw - jnp.round(t_raw)
    u = t * t
    p = u * 33.5482 - 74.90934
    p = u * p + 81.44769
    p = u * p - 41.33683
    p = u * p + 6.283161
    return t * p


def _assemble_pe(spec: MLPSpec, pd, consts):
    """VPU-side combined positional encoding, TRANSPOSED: from the packed
    (PTS_W, T) f32 block build pe_t (comb_width, T) bf16 — one sin pass
    plus outer-product broadcasts against the _pe_lane_consts columns.
    All f32 multiplies (exact), no transposes/relayouts: consumers
    contract pe_t over dim 0 (dot_general handles the transposed operand
    natively on the MXU)."""
    s = consts[:, 0:1] * pd[0:1, :]
    for c in range(1, 7):
        s = s + consts[:, c : c + 1] * pd[c : c + 1, :]
    mask = consts[:, 8:9]
    return (s + (_sin2pi(s) - s) * mask).astype(jnp.bfloat16)


def pack_points_dirs(pts, dirs):
    """(N,3) points + (N,3) dirs -> packed (PTS_W, N) f32 kernel input
    (row 6 = homogeneous ones for the phase column). The transposed
    layout keeps the HBM buffer lane-dense — an (N, 8) f32 array would
    physically pad its minor dim to 128 lanes (16x bloat) at the pallas
    {1,0}-layout boundary."""
    n = pts.shape[0]
    rows = [
        pts[:, 0], pts[:, 1], pts[:, 2],
        dirs[:, 0], dirs[:, 1], dirs[:, 2],
        jnp.ones((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    ]
    return jnp.stack([r.astype(jnp.float32) for r in rows])


def pack_rays(origins, directions, z_vals):
    """Packed kernel input straight from rays: o,d (R,3), z (R,S) ->
    (PTS_W, R*S). Fuses intervals_to_ray_points + the per-ray dir
    broadcast without ever materializing an (R,S,3) array (whose minor
    dim would lane-pad 3->128 physically)."""
    R, S = z_vals.shape
    z = z_vals.astype(jnp.float32)
    o = origins.astype(jnp.float32)
    d = directions.astype(jnp.float32)
    rows = [o[:, c, None] + d[:, c, None] * z for c in range(3)]
    rows += [jnp.broadcast_to(d[:, c, None], (R, S)) for c in range(3)]
    rows.append(jnp.ones((R, S), jnp.float32))
    rows.append(jnp.zeros((R, S), jnp.float32))
    return jnp.stack(rows).reshape(PTS_W, R * S)


def _flat_trunk(spec: MLPSpec, get) -> List[jnp.ndarray]:
    """Padded flat weights of layer1 + trunk (shared by the full and the
    sigma-only flattenings)."""
    bf16 = jnp.bfloat16
    flat: List[jnp.ndarray] = []
    # layer1: (pe_x, hidden)
    W, b = get(0)
    flat += [_pad_axis(W, spec.comb_width, 0).astype(bf16), b.astype(jnp.float32)]
    # trunk layers
    for i in range(1, spec.num_layers):
        W, b = get(i)
        if (i - 1) in spec.skip_layers:
            Wx, Wpe = W[: spec.hidden], W[spec.hidden :]
            flat += [
                Wx.astype(bf16),
                _pad_axis(Wpe, spec.comb_width, 0).astype(bf16),
                b.astype(jnp.float32),
            ]
        else:
            flat += [W.astype(bf16), b.astype(jnp.float32)]
    return flat


def _params_to_flat(spec: MLPSpec, params: Any) -> List[jnp.ndarray]:
    """Flax FlexibleNeRFModel params -> padded flat weight list.

    Order of TorchLinear submodules in the flax module (models/nerf_models.py):
    0: layer1, 1..num_layers-1: trunk, then feat, alpha, dir, rgb.
    Every PE consumer contracts against the SAME combined PE vector
    (_pe_lane_consts layout): xyz consumers have their rows at 0..pe_x,
    the dir consumer at d_off..d_off+pe_d; rows outside each consumer's
    block are zero, so the unused half of the combined vector is inert.
    """
    p = params["params"] if "params" in params else params

    def get(i):
        leaf = p[f"TorchLinear_{i}"]
        # biases as (1, F): TPU VMEM wants >=2-D operands.
        return jnp.asarray(leaf["kernel"]), jnp.asarray(leaf["bias"])[None, :]

    flat = _flat_trunk(spec, get)
    bf16 = jnp.bfloat16
    # feat head + separate alpha head (alpha is produced TRANSPOSED as a
    # (1, T) row so the kernel can emit the channels-first output without
    # an in-kernel transpose)
    Wf, bf_ = get(spec.num_layers)
    Wa, ba = get(spec.num_layers + 1)
    flat += [Wf.astype(bf16), bf_.astype(jnp.float32)]
    flat += [Wa.astype(bf16), ba.reshape(1, 1).astype(jnp.float32)]
    # dir layer: input (hidden + pe_d) -> half; pe rows land at d_off
    Wd, bd = get(spec.num_layers + 2)
    Wd_x, Wd_pe = Wd[: spec.hidden], Wd[spec.hidden :]
    half_pad = _round_up(spec.half, 128)
    Wd_pe = jnp.pad(
        Wd_pe, ((spec.d_off, spec.comb_width - spec.d_off - Wd_pe.shape[0]), (0, 0))
    )
    flat += [
        _pad_axis(Wd_x, half_pad, 1).astype(bf16),
        _pad_axis(Wd_pe, half_pad, 1).astype(bf16),
        _pad_axis(bd, half_pad, 1).astype(jnp.float32),
    ]
    # rgb head: (half, 3) -> pad cols to 8 (the kernel computes this head
    # transposed, (3, T), so the bias is stored as a column)
    Wr, br = get(spec.num_layers + 3)
    flat += [
        _pad_axis(_pad_axis(Wr, half_pad, 0), 8, 1).astype(bf16),
        _pad_axis(br, 8, 1).reshape(8, 1).astype(jnp.float32),
    ]
    return flat


def _make_dots(pe_t):
    """The two contraction helpers every tile body uses: activations @ W
    (bf16 in, f32 accum) and pe_t^T @ W without a transpose."""
    bf16 = jnp.bfloat16

    def dot(a, W):
        return jax.lax.dot_general(
            a.astype(bf16),
            W,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dot_pe(W):  # pe_t^T @ W without a transpose: contract dim 0 x dim 0
        return jax.lax.dot_general(
            pe_t, W,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return dot, dot_pe


def _trunk_tile(spec: MLPSpec, pe_t, ws: Sequence, *, save_acts=False):
    """layer1 + trunk (shared by the full forward and the sigma-only
    kernel). Returns (trunk output x (T, hidden) f32, acts, idx) where idx
    is the position of the first head weight in ws."""
    bf16 = jnp.bfloat16
    dot, dot_pe = _make_dots(pe_t)
    idx = 0

    acts = []

    def stash(v):
        # bf16 stash: halves the VMEM footprint of the backward recompute.
        acts.append(v.astype(bf16))

    W0, b0 = ws[idx], ws[idx + 1]
    idx += 2
    x = dot_pe(W0) + b0  # layer1: no activation before trunk layer 0
    for i in range(spec.num_layers - 1):
        if save_acts:
            stash(x)
        if i in spec.skip_layers:
            Wx, Wpe, b = ws[idx], ws[idx + 1], ws[idx + 2]
            idx += 3
            x = jax.nn.relu(dot(x, Wx) + dot_pe(Wpe) + b)
        else:
            W, b = ws[idx], ws[idx + 1]
            idx += 2
            x = jax.nn.relu(dot(x, W) + b)
    if save_acts:
        stash(x)  # trunk output (input of heads)
    return x, acts, idx


def _forward_tile(spec: MLPSpec, pe_t, ws: Sequence, *, save_acts=False):
    """Shared per-tile forward. ws is the flat weight list (values, not refs);
    pe_t is the TRANSPOSED (comb, T) bf16 PE block (contracted over dim 0).
    Returns (out (T,4) f32, acts) where acts are pre-activation inputs of
    each trunk layer (bf16) when save_acts."""
    bf16 = jnp.bfloat16
    dot, dot_pe = _make_dots(pe_t)
    x, acts, idx = _trunk_tile(spec, pe_t, ws, save_acts=save_acts)

    def stash(v):
        acts.append(v.astype(bf16))

    Wf, bf_ = ws[idx], ws[idx + 1]
    Wa, ba = ws[idx + 2], ws[idx + 3]
    idx += 4
    f_pre = dot(x, Wf) + bf_
    feat = jax.nn.relu(f_pre)
    # alpha TRANSPOSED: (1, T) via contracting Wa's hidden dim with x's —
    # lands directly in the channels-first output row.
    alpha_t = jax.lax.dot_general(
        Wa, x.astype(bf16),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + ba

    Wd_x, Wd_pe, bd = ws[idx], ws[idx + 1], ws[idx + 2]
    idx += 3
    h = jax.nn.relu(dot(feat, Wd_x) + dot_pe(Wd_pe) + bd)
    if save_acts:
        stash(f_pre)  # feat pre-activation
        stash(h)

    Wr, br_t = ws[idx], ws[idx + 1]
    # rgb TRANSPOSED: (8, T) pre-activation, sigmoid only on the 3 live rows.
    rgb_pre_t = jax.lax.dot_general(
        Wr, h.astype(bf16),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rgb_t = jax.nn.sigmoid(rgb_pre_t[:3] + br_t[:3])
    out_t = jnp.concatenate([rgb_t, alpha_t], axis=0)  # (4, T)
    return out_t, acts


def _fwd_kernel(spec: MLPSpec, n_weights: int, *refs):
    pd_ref, c_ref = refs[:2]
    w_refs = refs[2 : 2 + n_weights]
    out_ref = refs[2 + n_weights]
    ws = [r[:] for r in w_refs]
    pe_t = _assemble_pe(spec, pd_ref[:], c_ref[:])
    out, _ = _forward_tile(spec, pe_t, ws)
    out_ref[:] = out


def _bwd_kernel(spec: MLPSpec, n_weights: int, *refs):
    """Recompute forward (PE included); accumulate dW/db across the
    sequential grid.

    Accumulation runs in VMEM scratch (persistent across the sequential
    TPU grid) and flushes to the HBM outputs once, on the last step —
    read-modify-write of ~2.3MB of grads per grid step would otherwise
    ride HBM."""
    pd_ref, c_ref, g_ref = refs[:3]
    w_refs = refs[3 : 3 + n_weights]
    grad_refs = refs[3 + n_weights : 3 + 2 * n_weights]
    acc_refs = refs[3 + 2 * n_weights :]
    ws = [r[:] for r in w_refs]
    pe_t = _assemble_pe(spec, pd_ref[:], c_ref[:])

    _, acts = _forward_tile(spec, pe_t, ws, save_acts=True)

    def pos(v):
        # Mosaic has no bf16 vector compare; mask in f32.
        return (v.astype(jnp.float32) > 0).astype(jnp.float32)

    # acts: [trunk inputs x_0..x_{L-2}, trunk_out, f_pre, h]
    n_trunk = spec.num_layers - 1
    trunk_in = acts[:n_trunk]
    trunk_out = acts[n_trunk]
    f_pre = acts[n_trunk + 1]
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

    def dot_peT(b):  # pe^T @ b from the transposed pe_t: contract T dims
        return jax.lax.dot_general(
            pe_t, b.astype(bf16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    g_t = g_ref[:]  # (4, T) f32, channels-first cotangent
    drgb_t, dalpha_t = g_t[:3], g_t[3:4]

    # rgb head (sigmoid), transposed — mirrors the forward's (3, T) form
    idx_w = n_weights - 2  # Wr position in ws
    Wr, br_t = ws[idx_w], ws[idx_w + 1]
    rgb_pre_t = jax.lax.dot_general(
        Wr, h,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rgb_t = jax.nn.sigmoid(rgb_pre_t[:3] + br_t[:3])
    drgb8 = jnp.pad(drgb_t * rgb_t * (1.0 - rgb_t), ((0, 5), (0, 0)))  # (8, T)

    grads: List = [None] * n_weights
    grads[idx_w] = jax.lax.dot_general(
        h, drgb8.astype(bf16),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    grads[idx_w + 1] = jnp.sum(drgb8, axis=1)[:, None]
    dh = jax.lax.dot_general(
        drgb8.astype(bf16), Wr,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * pos(h)

    # dir layer
    idx_w -= 3
    Wd_x, Wd_pe = ws[idx_w], ws[idx_w + 1]
    grads[idx_w] = dotT_ab(jax.nn.relu(f_pre), dh)
    grads[idx_w + 1] = dot_peT(dh)
    grads[idx_w + 2] = jnp.sum(dh, axis=0)
    dfeat = dot_bT(dh, Wd_x)  # (T, hidden)

    # alpha head (transposed row)
    idx_w -= 2
    Wa = ws[idx_w]
    grads[idx_w] = jax.lax.dot_general(
        trunk_out, dalpha_t.astype(bf16),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    grads[idx_w + 1] = jnp.sum(dalpha_t).reshape(1, 1)
    dx_alpha = jax.lax.dot_general(
        dalpha_t.astype(bf16), Wa,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, hidden)

    # feat head
    idx_w -= 2
    df = dfeat * pos(f_pre)
    grads[idx_w] = dotT_ab(trunk_out, df)
    grads[idx_w + 1] = jnp.sum(df, axis=0)
    dx = dot_bT(df, ws[idx_w]) + dx_alpha  # (T, hidden)

    # trunk backwards
    for i in reversed(range(spec.num_layers - 1)):
        dx = dx * pos(trunk_out) if i == spec.num_layers - 2 else dx
        # post-activation grad for layer i output:
        x_in = trunk_in[i]
        if i in spec.skip_layers:
            idx_w -= 3
            Wx = ws[idx_w]
            grads[idx_w] = dotT_ab(x_in, dx)
            grads[idx_w + 1] = dot_peT(dx)
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
    grads[idx_w] = dot_peT(dx)
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


def _pad_packed(pd, tile):
    n = pd.shape[1]
    n_pad = _round_up(max(n, 1), tile)
    return _pad_axis(pd, n_pad, 1), n, n_pad


def _fused_mlp_fwd(spec: MLPSpec, pd, flat_weights):
    pd_p, n, n_pad = _pad_packed(pd, TILE)
    consts = jnp.asarray(_pe_lane_consts(spec))
    n_w = len(flat_weights)
    grid = (n_pad // TILE,)

    in_specs = [
        pl.BlockSpec((PTS_W, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_w)]

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, spec, n_w),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_pad), jnp.float32),
        interpret=_interpret(),
    )(pd_p, consts, *flat_weights)
    return out[:, :n], (pd, flat_weights)


def _fused_mlp_bwd(spec: MLPSpec, residuals, g):
    pd, flat_weights = residuals
    pd_p, n, n_pad = _pad_packed(pd, TILE_BWD)
    consts = jnp.asarray(_pe_lane_consts(spec))
    g_p = _pad_axis(g.astype(jnp.float32), n_pad, 1)
    n_w = len(flat_weights)
    grid = (n_pad // TILE_BWD,)

    in_specs = [
        pl.BlockSpec((PTS_W, TILE_BWD), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((4, TILE_BWD), lambda i: (0, i), memory_space=pltpu.VMEM),
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
        # The in-kernel PE temporaries push the recompute slightly past the
        # compiler's default 16MB scoped-vmem budget; v5e has headroom.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(pd_p, consts, g_p, *flat_weights)

    return jnp.zeros_like(pd), list(grads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_mlp_train(spec: MLPSpec, pd, flat_weights):
    out, _ = _fused_mlp_fwd(spec, pd, flat_weights)
    return out


fused_mlp_train.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def fused_mlp_infer(spec: MLPSpec, pd, flat_weights):
    """Forward-only variant (render/eval/mesh paths). Not differentiable —
    training goes through fused_mlp_train."""
    out, _ = _fused_mlp_fwd(spec, pd, flat_weights)
    return jax.lax.stop_gradient(out)


TILE_SIGMA = 8192


def pack_points_sigma(pts):
    """(N,3) points -> packed (PTS_W, N) f32 sigma-kernel input. Density
    does not depend on view direction (the alpha head hangs off the trunk,
    reference: src/nerf/models.py:52-54), so the dir rows are zero; row 6
    stays all-ones for the cos phase column."""
    n = pts.shape[0]
    z = jnp.zeros((n,), jnp.float32)
    rows = [
        pts[:, 0].astype(jnp.float32),
        pts[:, 1].astype(jnp.float32),
        pts[:, 2].astype(jnp.float32),
        z, z, z,
        jnp.ones((n,), jnp.float32),
        z,
    ]
    return jnp.stack(rows)


def _params_to_flat_sigma(spec: MLPSpec, params: Any) -> List[jnp.ndarray]:
    """Flat weights for the sigma-only kernel: layer1 + trunk + alpha head.
    The feat/dir/rgb heads (~18% of the FLOPs) are never shipped."""
    p = params["params"] if "params" in params else params

    def get(i):
        leaf = p[f"TorchLinear_{i}"]
        return jnp.asarray(leaf["kernel"]), jnp.asarray(leaf["bias"])[None, :]

    flat = _flat_trunk(spec, get)
    Wa, ba = get(spec.num_layers + 1)
    flat += [Wa.astype(jnp.bfloat16), ba.reshape(1, 1).astype(jnp.float32)]
    return flat


def _sigma_kernel(spec: MLPSpec, n_weights: int, *refs):
    pd_ref, c_ref = refs[:2]
    w_refs = refs[2 : 2 + n_weights]
    out_ref = refs[2 + n_weights]
    ws = [r[:] for r in w_refs]
    pe_t = _assemble_pe(spec, pd_ref[:], c_ref[:])
    x, _, idx = _trunk_tile(spec, pe_t, ws)
    Wa, ba = ws[idx], ws[idx + 1]
    # sigma TRANSPOSED (1, T): contract Wa's hidden dim with x's — lands in
    # the lane-dense output row without any in-kernel transpose.
    out_ref[:] = (
        jax.lax.dot_general(
            Wa,
            x.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + ba
    )


def fused_sigma_from_packed(model, params, pd, *, tile: int = TILE_SIGMA):
    """Density-only field query from a packed (PTS_W, N) input -> (N,) f32
    raw sigma (pre-ReLU, matching model.apply(...)[..., 3]).

    This is the mesh-extraction hot path (res^3 grid evals,
    src/mesh_nerf.py:27-53): vs the full fused forward it skips the
    feat/dir/rgb heads and never produces a channel-minor output, so no
    lane-padded (N, 4) array or (4, N) -> (N, 4) relayout exists anywhere.
    """
    spec = spec_from_model(model)
    flat = _params_to_flat_sigma(spec, params)
    pd_p, n, n_pad = _pad_packed(pd, tile)
    consts = jnp.asarray(_pe_lane_consts(spec))
    n_w = len(flat)

    in_specs = [
        pl.BlockSpec((PTS_W, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_w)]

    out = pl.pallas_call(
        functools.partial(_sigma_kernel, spec, n_w),
        grid=(n_pad // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(pd_p, consts, *flat)
    return jax.lax.stop_gradient(out[0, :n])


def fused_sigma_points(model, params, points, *, tile: int = TILE_SIGMA):
    """Density at (…, 3) points via the sigma-only kernel -> (…,) f32."""
    pts = points.reshape(-1, 3)
    out = fused_sigma_from_packed(model, params, pack_points_sigma(pts), tile=tile)
    return out.reshape(points.shape[:-1])


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


def _run(spec, pd, flat, inference):
    if inference:
        return fused_mlp_infer(spec, pd, flat)
    return fused_mlp_train(spec, pd, flat)


def fused_flexible_apply(model, params, ray_points, ray_directions, *, inference=False):
    """Drop-in for model.apply(params, points, dirs) on a FlexibleNeRFModel.

    Raw points/dirs in — the PE is computed inside the kernel, so no PE
    arrays ever materialize in HBM. `inference=True` selects the
    forward-only (stop_gradient) path; the default is the custom-vjp
    training pair.

    ray_directions may have one fewer batch dim than ray_points (per-ray
    dirs): broadcast to per-point raw dirs."""
    spec = spec_from_model(model)
    pts = ray_points.reshape(-1, 3)
    if ray_directions.ndim == ray_points.ndim - 1:
        samples = ray_points.shape[-2]
        dirs = jnp.broadcast_to(
            ray_directions[..., None, :],
            (*ray_directions.shape[:-1], samples, 3),
        ).reshape(-1, 3)
    else:
        dirs = ray_directions.reshape(-1, 3)
    flat = _params_to_flat(spec, params)
    out = _run(spec, pack_points_dirs(pts, dirs), flat, inference)
    return out.T.reshape(*ray_points.shape[:-1], 4)


def fused_flexible_apply_rays(
    model, params, origins, directions, z_vals, *, inference=False
):
    """Hot-path variant taken straight from rays: o,d (R,3), z (R,S) ->
    CHANNELS-FIRST field (4, R, S) (feed volume_render(channels_first=
    True)). Builds the packed kernel input directly (pack_rays) and keeps
    the field channels-leading end to end, so neither the (R,S,3) points
    array, the per-point dirs broadcast, nor a channel-minor (N,4) field
    (all physically lane-padded 16-40x on TPU) ever exists in HBM."""
    spec = spec_from_model(model)
    R, S = z_vals.shape
    flat = _params_to_flat(spec, params)
    out = _run(spec, pack_rays(origins, directions, z_vals), flat, inference)
    return out.reshape(4, R, S)
