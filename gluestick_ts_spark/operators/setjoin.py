"""Exact set-similarity self-join via prefix filtering (SSJoin /
PPJoin family — Chaudhuri et al. 2006, Xiao et al. 2008).

Finds ALL pairs of sets with Jaccard >= t, exactly, without a cross
join and without the "every pair sharing ANY token" blow-up of a
plain inverted-index join: sets are canonically ordered rarest-token-
first, and only each set's PREFIX (its first ``|s| - ceil(t*|s|) + 1``
tokens) is indexed. The prefix-filter theorem guarantees completeness:
two sets with ``|A ∩ B| >= ceil(t*max(|A|,|B|))`` — implied by
``J >= t`` — must share at least one token within those prefixes.
Because the canonical order puts the RAREST tokens in the prefix, the
blocking buckets are the small ones; the corpus's frequent tokens
(the quadratic killers of the naive inverted index) never block.

Scale shape:
- one token-keyed count aggregate (map-side combined) for the global
  canonical order;
- one id-keyed reassembly shuffle building each set's ordered array;
- the candidate join keys on PREFIX tokens only (size-filtered with
  ``t*|A| <= |B|`` before the pair is even deduped — J >= t bounds the
  size ratio);
- exact verification is IN-ROW array arithmetic over the bounded
  candidate pairs (``|∩| / (|A|+|B|-|∩|)``), never a token shuffle.

No reference counterpart (extension op — the exact companion to the
MinHash/LSH approximate dedup family: LSH proposes with error, this
finds every qualifying pair, provably).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["set_similarity_join"]


def set_similarity_join(
    df: DataFrame,
    id_col: str = "doc_id",
    set_col: str = "tokens",
    threshold: float = 0.8,
    materialize: bool = False,
) -> DataFrame:
    """All pairs ``(id_a < id_b)`` whose DISTINCT-element Jaccard
    similarity reaches ``threshold``. ``set_col`` is an array column
    (duplicates are collapsed — Jaccard is a set measure); empty sets
    never pair. Output: ``id_a, id_b, jaccard`` (ROUND 6), exact and
    partitioning-independent. ``id_col`` values must be unique.

    The canonically-ordered relation feeds FOUR plan branches (both
    prefix sides + both verify sides) and Spark does not reuse the
    exchange across them, so the lazy plan tokenizes and reassembles
    the corpus four times. ``materialize=True`` pins that relation
    once via an eager ``localCheckpoint`` — the right call at corpus
    scale, with ``ngram_jaccard_pairs``'s documented tradeoff: the
    call runs Spark jobs immediately, the pinned blocks are not
    recomputable after executor loss, and downstream filters cannot
    push below the checkpoint."""
    if not (0.0 < float(threshold) <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t = float(threshold)

    sets = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(F.col(set_col)).alias("s"),
    ).where(F.size("s") > 0)

    tok = sets.select(F.explode("s").alias("token"))
    freq = tok.groupBy("token").agg(F.count("*").alias("c"))

    # canonical rarest-first order: one id-keyed reassembly of each
    # set as a (count, token)-sorted array — ties break on the token
    # itself, so the order is total and engine-portable
    ordered = (
        sets.select("id", F.size("s").alias("n"), F.explode("s").alias("token"))
        .join(freq, on="token")
        .groupBy("id", "n")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("c", "token"))),
                lambda x: x["token"],
            ).alias("os")
        )
    )
    if materialize:
        ordered = ordered.localCheckpoint(eager=True)
    # prefix-filter length: |s| - ceil(t*|s|) + 1. The ceil must be of
    # the EXACT product: IEEE t*n can land a hair above an exact
    # integer (0.14*50 = 7.000000000000001), which would shorten the
    # prefix and silently drop boundary pairs — completeness bugs, not
    # precision noise. The 1e-9 back-off keeps ceil exact for every
    # integer-valued product (set sizes are integers, so true products
    # are never within 1e-9 of an integer from above) and can only
    # LENGTHEN the prefix otherwise — extra candidates, never misses.
    plen = F.col("n") - F.ceil(F.lit(t) * F.col("n") - F.lit(1e-9)).cast(
        "int"
    ) + 1
    pref = ordered.select(
        "id", "n", F.explode(F.slice("os", 1, plen)).alias("token")
    )

    a = pref.select(
        F.col("id").alias("id_a"), F.col("n").alias("na"), "token"
    )
    b = pref.select(
        F.col("id").alias("id_b"), F.col("n").alias("nb"), "token"
    )
    cand = (
        a.join(b, on="token")
        .where(F.col("id_a") < F.col("id_b"))
        # size filter: J >= t forces t <= |A|/|B| <= 1/t. Same float-
        # boundary guard as plen: the 1e-9 slack only ADMITS extra
        # candidates (the exact verify disposes of them), never drops
        # a pair whose exact ratio sits exactly at t
        .where(
            (F.col("nb").cast("double") >= F.lit(t) * F.col("na") - F.lit(1e-9))
            & (F.col("na").cast("double") >= F.lit(t) * F.col("nb") - F.lit(1e-9))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # verify against the ORDERED relation, not the raw sets: the
    # canonical array holds exactly the distinct elements (order is
    # irrelevant to |∩|/|∪|), and reusing `ordered` lets Spark's
    # ReuseExchange serve the candidate and verify branches from ONE
    # reassembly shuffle — the source is tokenized once, not three
    # times
    sa = ordered.select(F.col("id").alias("id_a"), F.col("os").alias("__sa"))
    sb = ordered.select(F.col("id").alias("id_b"), F.col("os").alias("__sb"))
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union = (
        F.size("__sa").cast("double") + F.size("__sb").cast("double") - inter
    )
    return (
        cand.join(sa, on="id_a")
        .join(sb, on="id_b")
        .select("id_a", "id_b", (inter / union).alias("__jac"))
        # threshold on the UNROUNDED ratio (exact integer-valued
        # doubles, identical IEEE division on every engine); round
        # only the reported value
        .where(F.col("__jac") >= t)
        .select("id_a", "id_b", F.round("__jac", 6).alias("jaccard"))
    )
