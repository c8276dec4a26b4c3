"""Blocked Pallas patch-match kernel: correlation matmul + online argmax.

The flagship TPU kernel (SURVEY.md §5 long-context analog): the reference
bounds the (h*w x h*w) correlation's memory by chunking ref patches in a
Python loop with a running max/argmax merge (ref_map_util.py:56-76). Here
the scores are never materialized in HBM at all: a (query-tile x ref-tile)
grid runs the MXU matmul per tile pair and folds a FlashAttention-style
online (max, argmax) reduction into the output block, which is revisited
across the ref-tile grid axis.

Tie-breaking parity: the running merge uses strict '>', so the earliest
ref tile wins ties (the torch chunked merge, ref_map_util.py:74), and
jnp.argmax picks the first maximum within a tile.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sweep at the production shape (10332 descriptors x D=2304, bf16,
# batch 16 vmapped; one v5e chip): 256/256 136 ms, 512/256 135,
# 512/512 128, 512/768 125, 256/512 130; TQ or TR >= 768 with TQ=768,
# or 1024 anywhere, fails Mosaic compile (VMEM). Results are identical
# for any tile size (f32 accumulation per tile; first-max tie-breaking
# is global: earliest tile wins via strict '>', first max within tile).
DEFAULT_TQ = 512
DEFAULT_TR = 512


def _match_kernel(nr_ref, q_ref, r_ref, bias_ref, val_ref, idx_ref):
    """One (query-tile, ref-tile) step.

    nr_ref: scalar-prefetch (1,) int32 — number of valid ref rows.
    q_ref: (TQ, D) query descriptors.
    r_ref: (TR, D) normalized ref descriptors (zero-padded past nr).
    bias_ref: (1, TR) f32 additive score bias (0, or -1e30 to exclude a
        ref candidate — the eval bucket-padding invariance protocol).
    val_ref/idx_ref: (TQ, 1) running max / argmax, revisited over j.
    """
    j = pl.program_id(1)
    tr = r_ref.shape[0]

    corr = jax.lax.dot_general(
        q_ref[:], r_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TQ, TR)
    corr = corr + bias_ref[:]

    # mask out padded ref rows
    col_ids = jax.lax.broadcasted_iota(jnp.int32, corr.shape, 1) + j * tr
    corr = jnp.where(col_ids < nr_ref[0], corr, -jnp.inf)

    local_max = jnp.max(corr, axis=1, keepdims=True)              # (TQ, 1)
    local_arg = (jnp.argmax(corr, axis=1
                            ).astype(jnp.int32).reshape(-1, 1) + j * tr)

    @pl.when(j == 0)
    def _():
        val_ref[:] = local_max
        idx_ref[:] = local_arg

    @pl.when(j > 0)
    def _():
        better = local_max > val_ref[:]
        val_ref[:] = jnp.where(better, local_max, val_ref[:])
        idx_ref[:] = jnp.where(better, local_arg, idx_ref[:])


def _pad_rows(x, multiple):
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


@functools.partial(jax.jit,
                   static_argnames=('tile_q', 'tile_r', 'interpret'))
def match_argmax(q, r, ref_bias=None, tile_q=DEFAULT_TQ, tile_r=DEFAULT_TR,
                 interpret=False):
    """argmax over ref rows of q @ r.T without materializing the scores.

    Args:
        q: (Nq, D) query descriptors (f32, or bf16 for the single-pass
           MXU path — accumulation is always f32).
        r: (Nr, D) ref descriptors, same dtype (normalized by caller).
        ref_bias: optional (Nr,) f32 additive score bias (0 to keep,
           -1e30 to exclude a candidate — bucket-pad invariance).
    Returns:
        (max_idx int32 (Nq,), max_val float32 (Nq,)).
    """
    nq, d = q.shape
    nr = r.shape[0]
    qp = _pad_rows(q, tile_q)
    rp = _pad_rows(r, tile_r)
    grid = (qp.shape[0] // tile_q, rp.shape[0] // tile_r)
    if ref_bias is None:
        bias_row = jnp.zeros((1, rp.shape[0]), jnp.float32)
    else:
        bias_row = _pad_rows(ref_bias.astype(jnp.float32).reshape(-1, 1),
                             tile_r).reshape(1, -1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((tile_r, d), lambda i, j, *_: (j, 0)),
            pl.BlockSpec((1, tile_r), lambda i, j, *_: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, 1), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((tile_q, 1), lambda i, j, *_: (i, 0)),
        ],
    )

    val, idx = pl.pallas_call(
        _match_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qp.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((qp.shape[0], 1), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * qp.shape[0] * rp.shape[0] * d,
            # per the operand dtype: bf16 descriptors (the serving
            # config) move half the bytes of f32
            bytes_accessed=(qp.shape[0] * d + grid[0] * rp.shape[0] * d)
            * qp.dtype.itemsize,
            transcendentals=0),
    )(jnp.asarray([nr], jnp.int32), qp, rp, bias_row)

    return idx[:nq, 0], val[:nq, 0]
