"""Batched descriptor matching on the MXU.

Fixed-size masked matching (BASELINE config 3): the similarity matrix is one
[N, M] matmul (unit descriptors -> cosine similarity), followed by a Lowe
ratio test on equivalent L2 distances (d^2 = 2 - 2 s) and a mutual
nearest-neighbor check. Invalid rows/columns are masked, never dropped —
shapes stay static for jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from cvsteer_tpu.utils.precision import precise


class Matches(NamedTuple):
    """index [N]: best match in B for each A keypoint (-1 = unmatched);
    score [N]: cosine similarity of the match; valid [N]: mask."""

    index: jax.Array
    score: jax.Array
    valid: jax.Array

    @property
    def count(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


@precise
def match_descriptors(
    desc_a: jax.Array,
    valid_a: jax.Array,
    desc_b: jax.Array,
    valid_b: jax.Array,
    *,
    ratio: float = 0.8,
    min_similarity: float = -1.0,
    mutual: bool = True,
) -> Matches:
    """Match unit descriptors ``desc_a [N, D]`` to ``desc_b [M, D]``.

    ``ratio``: Lowe ratio bound on L2 distances (best/second-best); 1.0
    disables the test. Batched use: vmap.
    """
    sim = jnp.dot(desc_a, desc_b.T, preferred_element_type=jnp.float32)
    neg = jnp.float32(-2.0)  # below any cosine similarity
    sim = jnp.where(valid_a[:, None] & valid_b[None, :], sim, neg)

    top2, top2_idx = lax.top_k(sim, 2)
    best, second = top2[:, 0], top2[:, 1]
    best_idx = top2_idx[:, 0]

    # Lowe test on distances: d = sqrt(2 - 2s) for unit vectors.
    d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best, 0.0))
    d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * second, 0.0))
    ok = valid_a & (best > min_similarity) & (best > neg) & (d1 <= ratio * d2)

    if mutual:
        rev_best = jnp.argmax(sim, axis=0)  # [M]: best A for each B
        ok &= rev_best[best_idx] == jnp.arange(sim.shape[0])

    return Matches(
        index=jnp.where(ok, best_idx, -1),
        score=jnp.where(ok, best, 0.0),
        valid=ok,
    )


def gather_matched_points(
    yx_a: jax.Array, yx_b: jax.Array, matches: Matches
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Aligned point pairs (pts_a [N,2], pts_b [N,2], mask [N]) from matches."""
    idx = jnp.maximum(matches.index, 0)
    return yx_a, yx_b[idx], matches.valid
