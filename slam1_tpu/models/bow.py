"""Bag-of-visual-words place recognition.

Replaces the reference BoW class (/root/reference/bag_of_words.py:10-53):
KMeans vocabulary over ORB descriptors, per-frame word histograms, and a
chi-squared distance scan against all sufficiently-old frames
(predict_previous, :29-42). Differences by design:

  - The vocabulary trains on descriptors ACCUMULATED ONLINE from the
    frames seen so far (a reservoir buffer), not on a full-sequence
    pre-pass (ref quirk: main.py:43-44 trains on the entire sequence
    before "online" operation — impossible in a live system).
  - The chi^2 scan over the whole frame DB is one masked reduction on
    device, O(F * K) elementwise — the reference's per-frame Python
    loop grows O(i) per query (SURVEY.md §3.4).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from slam1_tpu.config import BowConfig
from slam1_tpu.ops.brief import unpack_bits_pm1
from slam1_tpu.ops.kmeans import assign_words, kmeans_pm1


class BowState(NamedTuple):
    vocab: jnp.ndarray      # (K,D) float32 centroids in ±1 descriptor space
    trained: jnp.ndarray    # () bool
    db: jnp.ndarray         # (F,K) float32 L1-normalized histograms
    db_mask: jnp.ndarray    # (F,) bool — frame has a histogram
    reservoir: jnp.ndarray  # (R,D) float32 descriptor sample buffer
    res_mask: jnp.ndarray   # (R,)
    res_cursor: jnp.ndarray # () int32
    # Per-frame packed-descriptor sample, kept so frames seen BEFORE the
    # vocabulary trains can be backfilled into the DB with low sampling
    # noise (chi^2 noise ~ (K-1)/(2*S); S must be >> num_words).
    frame_desc: jnp.ndarray  # (F,S,Db) uint8
    frame_mask: jnp.ndarray  # (F,S) bool


def init_bow(cfg: BowConfig, max_frames: int, desc_bits: int = 256,
             reservoir: int = 8192) -> BowState:
    return BowState(
        vocab=jnp.zeros((cfg.num_words, desc_bits), jnp.float32),
        trained=jnp.asarray(False),
        db=jnp.zeros((max_frames, cfg.num_words), jnp.float32),
        db_mask=jnp.zeros((max_frames,), bool),
        reservoir=jnp.zeros((reservoir, desc_bits), jnp.float32),
        res_mask=jnp.zeros((reservoir,), bool),
        res_cursor=jnp.asarray(0, jnp.int32),
        frame_desc=jnp.zeros(
            (max_frames, cfg.backfill_desc_per_frame, desc_bits // 8),
            jnp.uint8),
        frame_mask=jnp.zeros(
            (max_frames, cfg.backfill_desc_per_frame), bool),
    )


@functools.partial(jax.jit, static_argnames=("n_sample",))
def accumulate(state: BowState, key, desc, mask,
               n_sample: int = 128) -> BowState:
    """Push a random sample of this frame's descriptors into the
    reservoir (ring buffer)."""
    g = -jnp.log(-jnp.log(jax.random.uniform(key, mask.shape, minval=1e-9,
                                             maxval=1.0)))
    _, pick = jax.lax.top_k(jnp.where(mask, g, -jnp.inf), n_sample)
    picked = unpack_bits_pm1(desc[pick]).astype(jnp.float32)
    picked_ok = mask[pick]
    r = state.reservoir.shape[0]
    rows = (state.res_cursor + jnp.arange(n_sample)) % r
    return state._replace(
        reservoir=state.reservoir.at[rows].set(
            jnp.where(picked_ok[:, None], picked, state.reservoir[rows])),
        res_mask=state.res_mask.at[rows].set(
            state.res_mask[rows] | picked_ok),
        res_cursor=state.res_cursor + n_sample,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def train(state: BowState, key, cfg: BowConfig) -> BowState:
    """Train the vocabulary on the reservoir (call once, host-triggered)."""
    vocab, _ = kmeans_pm1(key, state.reservoir, state.res_mask,
                          cfg.num_words, cfg.train_iters)
    return state._replace(vocab=vocab, trained=jnp.asarray(True))


def histogram(desc, mask, vocab):
    """(N,32) packed descriptors -> (K,) L1-normalized word histogram."""
    x = unpack_bits_pm1(desc).astype(jnp.float32)
    words = assign_words(x, vocab)
    k = vocab.shape[0]
    onehot = jax.nn.one_hot(words, k, dtype=jnp.float32)
    h = jnp.sum(onehot * mask[:, None].astype(jnp.float32), axis=0)
    return h / jnp.maximum(jnp.sum(h), 1.0)


@jax.jit
def add_frame(state: BowState, key, frame_idx, desc, mask,
              is_kf=True) -> BowState:
    """Insert this frame's histogram + descriptor sample; gated on
    keyframe status (only keyframes have a snapshot for geometric
    verification)."""
    ok = jnp.asarray(is_kf)
    row = jnp.where(ok, jnp.minimum(frame_idx, state.db.shape[0] - 1),
                    state.db.shape[0])            # OOB -> dropped
    # Uniform random sample of valid descriptors (also kept for future
    # backfill).
    s = state.frame_desc.shape[1]
    g = -jnp.log(-jnp.log(jax.random.uniform(key, mask.shape, minval=1e-9,
                                             maxval=1.0)))
    _, pick = jax.lax.top_k(jnp.where(mask, g, -jnp.inf),
                            min(s, mask.shape[0]))
    picked = desc[pick]
    picked_ok = mask[pick]
    if mask.shape[0] < s:
        pad = s - mask.shape[0]
        picked = jnp.concatenate(
            [picked, jnp.zeros((pad,) + picked.shape[1:], picked.dtype)])
        picked_ok = jnp.concatenate([picked_ok, jnp.zeros(pad, bool)])
    # The DB row comes from the SAME fixed-size sample as backfilled
    # rows, so every row carries the SAME sampling-noise floor. Mixing
    # full-frame rows (noise ~K/2N) with backfilled sampled rows (noise
    # ~K/2S, S<N) biases the argmin AWAY from pre-training frames: a
    # true revisit to frame 0 scores its row's higher noise floor and
    # loses to an accidental match against any clean row — exactly the
    # frames a KITTI-00 loop returns to.
    h = histogram(picked, picked_ok, state.vocab)
    return state._replace(
        db=state.db.at[row].set(h, mode="drop"),
        db_mask=state.db_mask.at[row].set(state.trained, mode="drop"),
        frame_desc=state.frame_desc.at[row].set(picked, mode="drop"),
        frame_mask=state.frame_mask.at[row].set(picked_ok, mode="drop"),
    )


@functools.partial(jax.jit, static_argnames=("chunk",))
def backfill_chunk(state: BowState, start, chunk: int) -> BowState:
    """Give pre-training frames a DB row after train() fires.

    The reference trains on the whole sequence up front so every frame
    is queryable (/root/reference/main.py:43-44, bag_of_words.py:29-42);
    the online design must instead backfill histograms for frames seen
    before the vocabulary existed — exactly the frames a KITTI-00-style
    loop returns to. Histograms come from each frame's stored
    descriptor sample (frame_desc). Processes rows [start, start+chunk).
    """
    f_cap = state.db.shape[0]
    rows = jnp.asarray(start, jnp.int32) + jnp.arange(chunk)
    rows_c = jnp.clip(rows, 0, f_cap - 1)
    d = state.frame_desc[rows_c]
    m = state.frame_mask[rows_c]
    h = jax.vmap(lambda dd, mm: histogram(dd, mm, state.vocab))(d, m)
    ok = (state.trained & ~state.db_mask[rows_c] & jnp.any(m, axis=1)
          & (rows < f_cap))
    rows_w = jnp.where(ok, rows_c, f_cap)
    return state._replace(
        db=state.db.at[rows_w].set(h, mode="drop"),
        db_mask=state.db_mask.at[rows_w].set(True, mode="drop"),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "k", "min_sep"))
def query_topk(state: BowState, frame_idx, desc, mask, cfg: BowConfig,
               k: int = 3, min_sep: int = 8
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chi^2 scan against all frames older than `query_exclude`,
    returning the k best SPATIALLY DISTINCT candidates (greedy
    non-maximum suppression with a +-min_sep frame exclusion window
    around each pick).

    The reference only ever considers the argmin (predict_previous,
    /root/reference/bag_of_words.py:42); near the histogram sampling
    noise floor the raw top-k is usually k adjacent frames around one
    (possibly spurious) minimum, so without NMS the runner-ups carry no
    extra information. With it, the genuine revisit reliably appears in
    the candidate set even when a noise frame wins the argmin — the
    geometric verification then picks the right one.

    Returns (frames (k,) int32 with -1 for "nothing eligible", sorted
    best-first; dists (k,) float32 with -1 in the empty slots).
    """
    h = histogram(desc, mask, state.vocab)
    diff2 = (state.db - h[None, :]) ** 2
    denom = state.db + h[None, :] + 1e-10
    chi2 = jnp.sum(diff2 / denom, axis=1)                   # (F,)
    f_cap = state.db.shape[0]
    ages_ok = jnp.arange(f_cap) <= frame_idx - cfg.query_exclude
    eligible = state.db_mask & ages_ok & state.trained
    chi2 = jnp.where(eligible, chi2, jnp.inf)

    def pick(c, _):
        b = jnp.argmin(c)
        v = c[b]
        sup = jnp.abs(jnp.arange(f_cap) - b) <= min_sep
        return jnp.where(sup, jnp.inf, c), (b, v)

    _, (idx, vals) = jax.lax.scan(pick, chi2, None, length=k)
    found = jnp.isfinite(vals)
    return (jnp.where(found, idx, -1).astype(jnp.int32),
            jnp.where(found, vals, -1.0).astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("cfg",))
def query(state: BowState, frame_idx, desc, mask,
          cfg: BowConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best-match variant of query_topk (ref predict_previous returning
    (argmin, min) or (-1,-1), bag_of_words.py:33-42)."""
    frames, dists = query_topk(state, frame_idx, desc, mask, cfg, k=1)
    return frames[0], dists[0]
