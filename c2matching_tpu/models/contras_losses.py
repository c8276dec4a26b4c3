"""Contrastive triplet loss + distillation KL — vectorized, mask-based.

Parity target: the inline per-sample loops in
mmsr/models/teacher_contras_model.py:115-210 and
student_contras_distillation_model.py:129-257. The Python batch loop and
boolean indexing become a fixed-shape vmap with validity masks:

- GT correspondences come from the homography coordinate grid subsampled
  at feature stride 4 (warp, teacher_contras_model.py:42-64); positions
  within 10px of the border are invalid.
- positive distance: 2 - 2*cos between matched descriptors (:166-167).
- negatives: hardest (min) over the dense distance matrix with a +10
  penalty inside the Chebyshev safe_radius (:169-189); invalid columns get
  a +1e4 penalty so they never win the min.
- per-sample loss = mean_valid ReLU(margin + pos - min(neg1, neg2)); a
  sample counts only if it has >= 128 valid correspondences (:156-157).
- stage-2 distillation: temperature-scaled row-softmax KL between teacher
  and student correlation matrices over the matched pairs, batchmean over
  valid rows (student_contras_distillation_model.py:209-240).
"""
import functools

import jax
import jax.numpy as jnp

BIG = 1e4
MIN_VALID_CORRS = 128


def _normalize_cols(desc, eps=1e-12):
    """L2-normalize (..., C) descriptor vectors."""
    norm = jnp.sqrt(jnp.sum(desc * desc, axis=-1, keepdims=True))
    return desc / jnp.maximum(norm, eps)


def _per_sample_terms(feat1, feat2, coords, safe_radius, scaling_steps):
    """Triplet-loss ingredients for one sample.

    Args:
        feat1: (h1, w1, C) dense features of image 1.
        feat2: (h2, w2, C) dense features of image 2 (warped image).
        coords: (H, W, 3) homography-transformed coordinate grid at image
            resolution, last dim (x, y, 1).
    Returns dict of per-position vectors/matrices + validity mask.
    """
    h1, w1, c = feat1.shape
    n = h1 * w1
    scale = 2 ** scaling_steps

    d1_all = _normalize_cols(feat1.reshape(n, c))          # (n, C)

    # feature-grid positions of image 1, (n, 2) as (y, x)
    gy = jnp.arange(h1, dtype=jnp.float32)
    gx = jnp.arange(w1, dtype=jnp.float32)
    fmap_pos1 = jnp.stack(
        [jnp.repeat(gy, w1), jnp.tile(gx, h1)], axis=-1)    # (n, 2) (y, x)

    # warped positions: coords sub-sampled at the feature stride
    # (teacher_contras_model.py:46-48) -> (n, 2) (x, y) at image scale
    pos2_xy = coords[::scale, ::scale, :2].reshape(n, 2)
    max_h = float(scale) * h1
    max_w = float(scale) * w1
    valid = ((pos2_xy[:, 0] > 10) & (pos2_xy[:, 0] < max_w - 10)
             & (pos2_xy[:, 1] > 10) & (pos2_xy[:, 1] < max_h - 10))

    # corresponding feature-grid positions in image 2 (y, x)
    fmap_pos2 = jnp.stack(
        [jnp.round(pos2_xy[:, 1] / scale), jnp.round(pos2_xy[:, 0] / scale)],
        axis=-1)
    fmap_pos2_i = jnp.clip(fmap_pos2.astype(jnp.int32),
                           jnp.zeros((2,), jnp.int32),
                           jnp.asarray([h1 - 1, w1 - 1], jnp.int32))

    flat2 = fmap_pos2_i[:, 0] * w1 + fmap_pos2_i[:, 1]
    d2 = _normalize_cols(feat2.reshape(n, c)[flat2])        # (n, C)

    pos_dist = 2.0 - 2.0 * jnp.sum(d1_all * d2, axis=-1)    # (n,)

    vmaskf = valid.astype(jnp.float32)

    # negative 2: matched-pos Chebyshev distances among fmap_pos2
    cheb2 = jnp.max(
        jnp.abs(fmap_pos2[:, None, :] - fmap_pos2[None, :, :]), axis=-1)
    penal2 = ((cheb2 <= safe_radius).astype(jnp.float32) * 10.0
              + (1.0 - vmaskf)[None, :] * BIG)
    dist2 = 2.0 - 2.0 * jnp.dot(d1_all, d2.T,
                                preferred_element_type=jnp.float32)
    neg2 = jnp.min(dist2 + penal2, axis=1)                  # (n,)

    # negative 1: d2_i vs ALL image-1 descriptors, masked around pos1_i
    cheb1 = jnp.max(
        jnp.abs(fmap_pos1[:, None, :] - fmap_pos1[None, :, :]), axis=-1)
    penal1 = (cheb1 <= safe_radius).astype(jnp.float32) * 10.0
    dist1 = 2.0 - 2.0 * jnp.dot(d2, d1_all.T,
                                preferred_element_type=jnp.float32)
    neg1 = jnp.min(dist1 + penal1, axis=1)                  # (n,)

    return {
        'd1': d1_all, 'd2': d2, 'pos_dist': pos_dist, 'neg1': neg1,
        'neg2': neg2, 'valid': vmaskf, 'flat2': flat2,
    }


@functools.partial(jax.jit, static_argnames=('safe_radius', 'scaling_steps',
                                             'margin'))
def triplet_loss_batch(feat1, feat2, coords, margin=1.0, safe_radius=4,
                       scaling_steps=2):
    """Batched triplet loss (stage 1). feat*: (B, h, w, C); coords:
    (B, H, W, 3). Returns (loss, pos_dist, neg_dist, n_valid_samples)."""
    terms = jax.vmap(functools.partial(
        _per_sample_terms, safe_radius=safe_radius,
        scaling_steps=scaling_steps))(feat1, feat2, coords)

    v = terms['valid']                                      # (B, n)
    n_valid = jnp.sum(v, axis=1)                            # (B,)
    sample_ok = (n_valid >= MIN_VALID_CORRS).astype(jnp.float32)
    denom = jnp.maximum(n_valid, 1.0)

    neg = jnp.minimum(terms['neg1'], terms['neg2'])
    diff = terms['pos_dist'] - neg
    per_sample_loss = jnp.sum(
        jax.nn.relu(margin + diff) * v, axis=1) / denom
    per_sample_pos = jnp.sum(terms['pos_dist'] * v, axis=1) / denom
    per_sample_neg = jnp.sum(neg * v, axis=1) / denom

    n_ok = jnp.maximum(jnp.sum(sample_ok), 1.0)
    loss = jnp.sum(per_sample_loss * sample_ok) / n_ok
    pos = jnp.sum(per_sample_pos * sample_ok) / n_ok
    negm = jnp.sum(per_sample_neg * sample_ok) / n_ok
    return loss, pos, negm, jnp.sum(sample_ok)


def _kl_rows(student_logits, teacher_logits, valid):
    """Row-wise KL(teacher || student) over valid rows/cols, batchmean
    over valid rows (F.kl_div(log_softmax(s), softmax(t), 'batchmean'))."""
    neg_inf = -1e9
    col_mask = jnp.where(valid[None, :] > 0, 0.0, neg_inf)
    s = jax.nn.log_softmax(student_logits + col_mask, axis=1)
    t = jax.nn.softmax(teacher_logits + col_mask, axis=1)
    t_log = jax.nn.log_softmax(teacher_logits + col_mask, axis=1)
    per_row = jnp.sum(jnp.where(t > 0, t * (t_log - s), 0.0), axis=1)
    n_rows = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(per_row * valid) / n_rows


@functools.partial(jax.jit, static_argnames=('safe_radius', 'scaling_steps',
                                             'margin', 'temperature',
                                             'distill_weight'))
def distillation_loss_batch(student_feat1, student_feat2, teacher_feat1,
                            teacher_feat2, coords, margin=1.0,
                            safe_radius=4, scaling_steps=2,
                            temperature=0.15, distill_weight=15.0):
    """Stage-2 loss: student triplet + KL distillation from the frozen
    teacher (student_contras_distillation_model.py:129-257).

    Returns (loss, pos_dist, neg_dist, distill_loss, n_valid_samples)."""
    fn = functools.partial(_per_sample_terms, safe_radius=safe_radius,
                           scaling_steps=scaling_steps)
    s_terms = jax.vmap(fn)(student_feat1, student_feat2, coords)

    b, h1, w1, c = teacher_feat1.shape
    n = h1 * w1
    t_d1 = _normalize_cols(teacher_feat1.reshape(b, n, c))
    t_d2 = _normalize_cols(
        jnp.take_along_axis(teacher_feat2.reshape(b, n, c),
                            s_terms['flat2'][..., None], axis=1))

    def one(sd1, sd2, td1, td2, valid):
        s_logits = jnp.dot(sd1, sd2.T,
                           preferred_element_type=jnp.float32) / temperature
        t_logits = jnp.dot(td1, td2.T,
                           preferred_element_type=jnp.float32) / temperature
        return _kl_rows(s_logits, t_logits, valid)

    distill = jax.vmap(one)(s_terms['d1'], s_terms['d2'], t_d1, t_d2,
                            s_terms['valid'])

    v = s_terms['valid']
    n_valid = jnp.sum(v, axis=1)
    sample_ok = (n_valid >= MIN_VALID_CORRS).astype(jnp.float32)
    denom = jnp.maximum(n_valid, 1.0)

    neg = jnp.minimum(s_terms['neg1'], s_terms['neg2'])
    diff = s_terms['pos_dist'] - neg
    per_sample_triplet = jnp.sum(
        jax.nn.relu(margin + diff) * v, axis=1) / denom
    per_sample_pos = jnp.sum(s_terms['pos_dist'] * v, axis=1) / denom
    per_sample_neg = jnp.sum(neg * v, axis=1) / denom

    n_ok = jnp.maximum(jnp.sum(sample_ok), 1.0)
    triplet = jnp.sum(per_sample_triplet * sample_ok) / n_ok
    distill_mean = jnp.sum(distill * sample_ok) / n_ok
    loss = triplet + distill_weight * distill_mean
    pos = jnp.sum(per_sample_pos * sample_ok) / n_ok
    negm = jnp.sum(per_sample_neg * sample_ok) / n_ok
    return loss, pos, negm, distill_mean, jnp.sum(sample_ok)
