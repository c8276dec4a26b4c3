"""Pallas tent-contraction kernel for the windowed deformable conv.

Consumes the (NB, K, win, win*C) window rows gathered by
ops/dcn_window.py and produces the convolved output, reading each window
exactly ONCE from HBM (the pure-XLA contraction re-reads the windows per
tap or materializes blown-up broadcasts — measured 65-80 ms at relu1
eval scale vs the window bytes' ~2 ms floor).

Layout strategy (found by measurement — see the numbers below): Mosaic
cannot slice lanes at sub-128 granularity, so the per-(pixel, tap,
group) tent inputs ry/rx/mm are PRE-EXPANDED by XLA to (NB*Q, K*R)
lanes, R = rep*C >= 128, with each group's scalar broadcast over its
channel block (a fused XLA broadcast-write; ~0.8 GB per field at relu1
eval scale). In-kernel alternatives measured slower: MXU 0/1-expansion
matmuls are dot-call/tile-quantum bound (39-59 ms of the kernel,
whether as 3 f32 dots or 6 bf16 hi/lo dots per tap); in-kernel lane
concatenation hangs the Mosaic compiler.

Per grid step (a tile of QT blocks, Q = blk^2 pixels each), per tap:
  - slice the tap's R lanes (128-aligned) from the pre-expanded fields;
  - tile rx to win*C lanes with pltpu.repeat: fold slice s at lane l
    holds x-cell jx = s*rep + l//C, so tent weights
    tent(d) = max(0, 1 - |d|) against a lane-constant iota reproduce
    the bilinear corner weights exactly;
  - the VPU multiplies each window row by the x-tents, folds
    win*C -> R by summing 128-aligned slices, applies the y-tent and
    modulation (both constant across jx, hence applied at fold width)
    and accumulates into a (QT*Q, K*R) cols scratch;
  - one MXU matmul against the (K*R, Co) rep-folded conv weight
    finishes the step (lane l of a folded slice carries channel l % C,
    so the weight rows tile rep times per tap and the last fold is
    absorbed by the matmul for free).

Forward-only and EXPERIMENTAL (see ops/dcn_window.py for the measured
cost breakdown and why it is not wired into the model).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 9


def _fold_r(c, win):
    """Fold target width: a multiple of C that divides win*C, >= 128 if
    possible (lane-slice alignment), minimal otherwise."""
    winc = win * c
    if c % 128 == 0:
        return c
    r = c
    while r < 128 or winc % r:
        r += c
        if r >= winc:
            return winc
    return r


def _fold_weight(weight, r):
    """(K, C, Co) -> (K*R, Co): lane l of a folded slice carries channel
    l % C, so the weight rows tile R//C times per tap."""
    k, c, co = weight.shape
    rep = r // c
    w2 = jnp.broadcast_to(weight[:, None], (k, rep, c, co))
    return w2.reshape(k * r, co)


def _kernel(rows_ref, ry_ref, rx_ref, mm_ref, w2_ref, out_ref, cols_scr,
            *, qt, q, c, win, r, co, interp):
    qtq = qt * q
    winc = win * c
    nfold = winc // r

    jxc = (jax.lax.broadcasted_iota(jnp.int32, (1, winc), 1)
           // c).astype(jnp.float32)

    for k in range(K):
        rxk = rx_ref[:, k * r:(k + 1) * r]             # (QTQ, R)
        if nfold > 1:
            if interp:
                rxw = jnp.concatenate([rxk] * nfold, axis=-1)
            else:
                rxw = pltpu.repeat(rxk, nfold, axis=1)  # (QTQ, win*C)
        else:
            rxw = rxk
        tx = jnp.maximum(0., 1. - jnp.abs(rxw - jxc))
        tx3 = tx.reshape(qt, q, winc)
        mm3 = mm_ref[:, k * r:(k + 1) * r].reshape(qt, q, r)
        ry3 = ry_ref[:, k * r:(k + 1) * r].reshape(qt, q, r)

        acc = jnp.zeros((qt, q, r), jnp.float32)
        for wy in range(win):
            row = rows_ref[:, k, wy, :].astype(jnp.float32)  # (QT,winC)
            prod = row[:, None, :] * tx3
            fold = prod[:, :, :r]
            for s in range(1, nfold):
                fold = fold + prod[:, :, s * r:(s + 1) * r]
            tym = jnp.maximum(0., 1. - jnp.abs(ry3 - wy)) * mm3
            acc = acc + tym * fold
        cols_scr[:, :, k * r:(k + 1) * r] = acc

    cols = cols_scr[:].reshape(qtq, K * r)
    out = jnp.dot(cols, w2_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = out.reshape(qt, q, co)


def _expand_field(t, blk, nby, nbx, r, c):
    """(G, K, P) -> (NB*Q, K*R): block-major pixels, each (tap, group)
    scalar broadcast over its rep * Cg channel lanes (lane within a
    tap's R block = rep_i*C + g*Cg + cc)."""
    g, k, p = t.shape
    cg = c // g
    rep = r // c
    t = t.reshape(g, k, nby, blk, nbx, blk)
    t = t.transpose(2, 4, 3, 5, 1, 0)          # NBy, NBx, by, bx, K, G
    t = jnp.broadcast_to(t[..., None, :, None],
                         (nby, nbx, blk, blk, k, rep, g, cg))
    return t.reshape(nby * nbx * blk * blk, k * r)


@functools.partial(jax.jit,
                   static_argnames=('blk', 'win', 'nby', 'nbx', 'qt'))
def window_contract_pallas(rows, ry, rx, mm, weight, blk, win, nby, nbx,
                           qt=8):
    """rows: (NB, K, win, win*C); ry/rx/mm: (G, K, P) f32;
    weight: (K, C, Co). Returns (Ho, Wo, Co) f32."""
    nb = nby * nbx
    q = blk * blk
    c = rows.shape[-1] // win
    co = weight.shape[-1]
    r = _fold_r(c, win)

    t_ry = _expand_field(ry, blk, nby, nbx, r, c)
    t_rx = _expand_field(rx, blk, nby, nbx, r, c)
    t_mm = _expand_field(mm, blk, nby, nbx, r, c)
    w2 = _fold_weight(weight.astype(jnp.float32), r)

    qt = min(qt, nb)
    nbp = -(-nb // qt) * qt
    if nbp != nb:
        rows = jnp.pad(rows, ((0, nbp - nb),) + ((0, 0),) * 3)
        qpad = ((0, (nbp - nb) * q), (0, 0))
        t_ry = jnp.pad(t_ry, qpad)
        t_rx = jnp.pad(t_rx, qpad)
        t_mm = jnp.pad(t_mm, qpad)

    interp = jax.default_backend() == 'cpu'
    kern = functools.partial(_kernel, qt=qt, q=q, c=c, win=win, r=r,
                             co=co, interp=interp)
    tspec = pl.BlockSpec((qt * q, K * r), lambda i: (i, 0))
    out = pl.pallas_call(
        kern,
        grid=(nbp // qt,),
        in_specs=[
            pl.BlockSpec((qt, K, win, win * c), lambda i: (i, 0, 0, 0)),
            tspec, tspec, tspec,
            pl.BlockSpec((K * r, co), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((qt, q, co), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nbp, q, co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((qt, q, K * r), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interp,
    )(rows, t_ry, t_rx, t_mm, w2)

    out = out[:nb].reshape(nby, nbx, blk, blk, co)
    out = out.transpose(0, 2, 1, 3, 4)
    return out.reshape(nby * blk, nbx * blk, co)
