"""Candidate-block windowed formulation of the modulated deformable conv.

STATUS: EXPERIMENTAL — correct (oracle-tested, exact-fallback via
lax.cond) but NOT wired into the model. Measured on one v5e at CUFED5
relu1 eval scale (512x336x64, G=8) against the production corner-packed
path (97 ms f32 / 86 ms bf16):

  - the windowed GATHER itself wins as designed: 0.77M indices / 0.79 GB
    vs 12.4M indices / 1.58 GB (the XLA row-gather is bound by BOTH
    ~28 GB/s of gathered bytes and ~190M indices/s);
  - but the tent-weight contraction that replaces the per-corner gather
    is VPU/data-movement-bound and eats the win: the Pallas kernel floor
    measured 44 ms (v5e VPU sustains ~1k lanes/cycle; the dense
    win x win tent contraction is ~20G lane-ops), XLA-side tent
    pre-expansion costs 56 ms in its best (MXU) formulation, in-kernel
    MXU 0/1-expansions are dot-call-quantum-bound (39-59 ms), and the
    full op at relu1 scale OOMs 16 GB HBM without chunking;
  - net: ~64-75 ms optimistic end-to-end vs 86 ms production bf16 — not
    worth the compile-time landmines (a lax.cond over both paths at this
    scale did not finish compiling in 15 min).

ROUND-3 CLOSURE — the row-chunked variant
(``modulated_deform_conv_windowed_chunked``, the one remaining idea for
the full-scale OOM) was built, verified correct, and measured on the
same v5e at relu1 eval scale: 175 ms (8 chunks) / 187 ms (4 chunks) vs
83 ms production (both including the ~36 ms tunnel fetch) — 2x SLOWER.
Sequentializing the Pallas dispatches and rebuilding the x-packed
operand per chunk erode far past the documented ~64-75 ms whole-image
optimum, which itself was only ~15% under production. This file is
CLOSED as a production candidate; it stays as a tested, documented
record so the formulation is not re-explored blind.

Motivation and structure (still valid): C2-Matching's DynAgg offsets
(ops/flow.py:match_to_pre_offsets) make the pre-offset of kernel tap k
at output pixel p a step-aligned-block-constant integer flow plus a
small learned residual, so for an aligned ``blk x blk`` output block b
and tap k, ALL blk^2 pixels x G groups sample inside one small window
around a shared anchor:

    s(p, g, k) = s(p0, 0, k) + (p - p0) + (resid(p,g,k) - resid(p0,0,k))

Gathering ONE ``win x win x C`` window per (block, tap) (win = blk + 4)
replaces the per-(pixel, group, tap) corner gather, and the bilinear
corner extraction becomes a dense tent-weight contraction
(tent(d) = max(0, 1-|d|) reproduces the bilinear corner weights exactly,
including zero-padding semantics, because out-of-image cells are
gathered as zeros).

The formulation is only VALID when every in-bounds tap lands inside its
block's window; ``modulated_deform_conv_windowed`` computes the coverage
predicate on device and switches via ``jax.lax.cond`` to the exact
corner-packed path otherwise: bit-exact semantics for ARBITRARY offsets.

Parity target: same CUDA-kernel sampling semantics as
ops/deform_conv.py (dcn_v2_im2col_cuda.cu:166-189).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .deform_conv import (_base_grid, _mdc_fast_single,
                          modulated_deform_conv, use_group_scan)

MARGIN = 2  # zero-pad ring; window origin O = floor(anchor) - 1 >= -2


def _window_prep(x, offset, mask, blk, win):
    """Shared prep: sample coords, per-(block, tap) window origins,
    in-window relative coords, modulation, coverage predicate.

    Returns (origins, ry, rx, mm, ok):
      origins: (NB, K, 2) int32 window origins (y, x), clamped
      ry, rx: (G, K, P) f32 coords relative to the block's window origin
      mm: (G, K, P) f32 modulation * validity
      ok: scalar bool — every valid tap's bilinear support is in-window
    """
    h, w, c = x.shape
    ho, wo, g, k, _ = offset.shape
    p = ho * wo
    m = MARGIN

    base_y, base_x, ky, kx = _base_grid(ho, wo, 3, 3, (1, 1), (1, 1),
                                        (1, 1))
    offt = (offset.astype(jnp.float32)
            .reshape(p, g * k * 2).T.reshape(g, k, 2, p))
    sy = base_y[None, None, :] + ky[None, :, None] + offt[:, :, 0]
    sx = base_x[None, None, :] + kx[None, :, None] + offt[:, :, 1]
    mt = mask.astype(jnp.float32).reshape(p, g * k).T.reshape(g, k, p)
    valid = (sy > -1.) & (sy < h) & (sx > -1.) & (sx < w)
    mm = mt * valid.astype(jnp.float32)

    # window origin per (block, tap) from group 0's top-left pixel
    nby, nbx = ho // blk, wo // blk
    s0y = sy[0].reshape(k, ho, wo)[:, ::blk, ::blk]      # (K, NBy, NBx)
    s0x = sx[0].reshape(k, ho, wo)[:, ::blk, ::blk]
    oy = jnp.clip(jnp.floor(s0y).astype(jnp.int32) - 1, -m,
                  h + m - win)                            # (K, NBy, NBx)
    ox = jnp.clip(jnp.floor(s0x).astype(jnp.int32) - 1, -m,
                  w + m - win)

    # relative coords: broadcast origin over the block's pixels
    def rel(s, o):
        ob = jnp.broadcast_to(o[:, :, None, :, None],
                              (k, nby, blk, nbx, blk))
        ob = ob.reshape(k, p).astype(jnp.float32)
        return s - ob[None]                               # (G, K, P)

    ry = rel(sy, oy)
    rx = rel(sx, ox)

    inw = ((ry >= 0.) & (ry < win - 1.) & (rx >= 0.) & (rx < win - 1.))
    ok = jnp.all(inw | ~valid)

    origins = jnp.stack([oy.reshape(k, -1).T, ox.reshape(k, -1).T],
                        axis=-1)                          # (NB, K, 2)
    return origins, ry, rx, mm, ok


def _window_gather(x, origins, win):
    """(NB, K, win, win*C) window rows: one x-packed row-gather of
    NB*K*win indices over a zero-padded operand in x.dtype."""
    h, w, c = x.shape
    m = MARGIN
    nb, k, _ = origins.shape
    xpad = jnp.pad(x, ((m, m), (m, m), (0, 0)))
    wp = w + 2 * m - win + 1
    # packed[Y, X, j*C + cc] = xpad[Y, X + j, cc]
    packed = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(xpad, j, wp, axis=1)
         for j in range(win)], axis=-1)
    packed = packed.reshape((h + 2 * m) * wp, win * c)

    oy = origins[..., 0] + m                              # (NB, K)
    ox = origins[..., 1] + m
    idx = ((oy[..., None] + jnp.arange(win)[None, None, :]) * wp
           + ox[..., None])                               # (NB, K, win)
    rows = jnp.take(packed, idx.reshape(-1), axis=0)
    return rows.reshape(nb, k, win, -1)


def _tents(ry, rx, mm, blk, win, nby, nbx):
    """Tent weights in block-major layout.

    Returns ty, txm: (NB, Q=blk^2, G, K, win) f32; txm has the
    modulation*validity folded in."""
    g, k, p = ry.shape
    ho, wo = nby * blk, nbx * blk

    def blockify(t):                                      # -> (NB,Q,G,K)
        t = t.reshape(g, k, nby, blk, nbx, blk)
        t = t.transpose(2, 4, 3, 5, 0, 1)                 # NBy,NBx,by,bx,G,K
        return t.reshape(nby * nbx, blk * blk, g, k)

    iw = jnp.arange(win, dtype=jnp.float32)
    ty = jnp.maximum(0., 1. - jnp.abs(blockify(ry)[..., None] - iw))
    tx = jnp.maximum(0., 1. - jnp.abs(blockify(rx)[..., None] - iw))
    txm = tx * blockify(mm)[..., None]
    return ty, txm


def _window_contract_xla(rows, ty, txm, weight, blk, win, nby, nbx):
    """Reference contraction: out[p, co] from tent-weighted windows.

    rows: (NB, K, win, win*C); ty/txm: (NB, Q, G, K, win);
    weight: (K, C, Co)."""
    nb, k, _, _ = rows.shape
    co = weight.shape[-1]
    c = rows.shape[-1] // win
    g = ty.shape[2]
    cg = c // g
    rows5 = rows.astype(jnp.float32).reshape(nb, k, win, win, g, cg)
    t1 = jnp.einsum('nkyxgc,nqgkx->nqkgyc', rows5, txm)
    cols = jnp.einsum('nqkgyc,nqgky->nqkgc', t1, ty)
    cols = cols.reshape(nb, blk * blk, k * c)
    out = jnp.einsum('nqe,eo->nqo', cols,
                     weight.astype(jnp.float32).reshape(k * c, co),
                     preferred_element_type=jnp.float32)
    out = out.reshape(nby, nbx, blk, blk, co).transpose(0, 2, 1, 3, 4)
    return out.reshape(nby * blk, nbx * blk, co)


def _mdc_window_single(x, origins, ry, rx, mm, weight, blk, win,
                       use_pallas, out_hw=None):
    h, w, _ = x.shape
    if out_hw is None:
        out_hw = (h, w)
    nby, nbx = out_hw[0] // blk, out_hw[1] // blk
    rows = _window_gather(x, origins, win)
    if use_pallas:
        from .pallas.dcn_window_kernel import window_contract_pallas
        return window_contract_pallas(rows, ry, rx, mm, weight, blk, win,
                                      nby, nbx)
    ty, txm = _tents(ry, rx, mm, blk, win, nby, nbx)
    return _window_contract_xla(rows, ty, txm, weight, blk, win, nby, nbx)


def window_applicable(x_shape, offset_shape, blk, win, kernel_size=(3, 3),
                      stride=(1, 1), padding=(1, 1), dilation=(1, 1)):
    """Static check: shapes/config admit the windowed formulation."""
    _, h, w, _ = x_shape
    _, ho, wo, _, k, _ = offset_shape
    return ((kernel_size, stride, padding, dilation)
            == ((3, 3), (1, 1), (1, 1), (1, 1))
            and k == 9 and ho == h and wo == w and blk >= 1 and win >= 4
            and h % blk == 0 and w % blk == 0
            and h + 2 * MARGIN >= win and w + 2 * MARGIN >= win)


@functools.partial(jax.jit, static_argnames=('blk', 'win', 'use_pallas',
                                             'row_chunks'))
def modulated_deform_conv_windowed_chunked(x, offset, mask, weight,
                                           bias=None, blk=4, win=8,
                                           use_pallas=True, row_chunks=8):
    """Windowed fast path with the output rows processed in
    ``row_chunks`` sequential chunks to bound HBM (the full-scale OOM is
    the whole-image window buffer + pre-expanded tent fields; each chunk
    holds 1/row_chunks of them). The gather still reads the full image
    (windows near a chunk boundary reach outside the chunk's rows).

    MEASUREMENT-ORIENTED: assumes the windowed formulation is valid for
    the given offsets (the DynAgg structure — block-constant integer
    flow + small residual); unlike ``modulated_deform_conv_windowed``
    there is NO runtime fallback. Chunk-local output rows are made
    global by adding the chunk's row origin to the y-offsets (the prep's
    base grid is position-linear, so sy comes out in global
    coordinates).

    MEASURED 2x SLOWER than production at relu1 eval scale (module
    docstring, round-3 closure) — kept only as the record of that
    experiment.
    """
    b, h, w, c = x.shape
    assert h % row_chunks == 0 and (h // row_chunks) % blk == 0
    rows_per = h // row_chunks

    def one(xi, oi, mi):
        outs = []
        for ci in range(row_chunks):
            r0 = ci * rows_per
            oc = jax.lax.dynamic_slice_in_dim(oi, r0, rows_per, axis=0)
            # globalize: sy = base_y(local) + ky + (dy + r0). In f32:
            # adding a row origin >= 256 in bf16 would quantize away the
            # learned sub-pixel dy residual (bf16 resolution is 2.0 at
            # that magnitude); _window_prep keeps coordinates f32 anyway.
            oc = oc.astype(jnp.float32).at[..., 0].add(jnp.float32(r0))
            mc = jax.lax.dynamic_slice_in_dim(mi, r0, rows_per, axis=0)
            # _window_prep's base grid is position-linear and its clip
            # bounds come from x's (global) shape, so globalized offsets
            # give global sampling coords with a chunk-sized output grid
            origins, ry, rx, mm, _ok = _window_prep(xi, oc, mc, blk, win)
            outs.append(_mdc_window_single(xi, origins, ry, rx, mm,
                                           weight, blk=blk, win=win,
                                           use_pallas=use_pallas,
                                           out_hw=(rows_per, w)))
        return jnp.concatenate(outs, axis=0)

    if b == 1:
        out = one(x[0], offset[0], mask[0])[None]
    else:
        def step(_, args):
            return None, one(*args)

        _, out = jax.lax.scan(step, None, (x, offset, mask))
    if bias is not None:
        out = out + bias
    return out


@functools.partial(jax.jit, static_argnames=('blk', 'win', 'use_pallas',
                                             'group_scan'))
def modulated_deform_conv_windowed(x, offset, mask, weight, bias=None,
                                   blk=4, win=8, use_pallas=True,
                                   group_scan=None):
    """DCNv2 forward with the candidate-block windowed fast path.

    Same semantics as ``modulated_deform_conv`` for the 3x3/stride-1/
    pad-1/dilation-1 configuration, for ARBITRARY offsets: a per-image
    runtime coverage check picks the windowed kernel when every valid
    tap's bilinear support lies inside its block window, and falls back
    to the exact corner-packed path otherwise (jax.lax.cond — only the
    taken branch executes).

    Args match ``modulated_deform_conv``; ``blk`` is the aligned output
    block (4 at relu1 / x4 candidate stride, 2 at relu2), ``win`` the
    window size in cells (blk + 4 covers residual spread < 1).
    """
    b, h, w, c = x.shape

    # static precondition gate: unsupported shapes (h % blk != 0, small
    # images, non-3x3 config) take the exact path entirely instead of
    # crashing at trace time inside _window_prep
    if not window_applicable(x.shape, offset.shape, blk, win):
        return modulated_deform_conv(x, offset, mask, weight, bias)

    if group_scan is None:
        group_scan = use_group_scan(h, w, c, x.dtype)

    def one(xi, oi, mi):
        origins, ry, rx, mm, ok = _window_prep(xi, oi, mi, blk, win)

        def win_path(args):
            xi, oi, mi = args
            return _mdc_window_single(xi, origins, ry, rx, mm, weight,
                                      blk=blk, win=win,
                                      use_pallas=use_pallas)

        def exact_path(args):
            xi, oi, mi = args
            return _mdc_fast_single(xi, oi, mi, weight,
                                    group_scan=group_scan)

        return jax.lax.cond(ok, win_path, exact_path, (xi, oi, mi))

    if b == 1:
        out = one(x[0], offset[0], mask[0])[None]
    else:
        def step(_, args):
            return None, one(*args)

        _, out = jax.lax.scan(step, None, (x, offset, mask))
    if bias is not None:
        out = out + bias
    return out
