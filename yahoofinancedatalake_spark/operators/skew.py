"""Skew-handling join (salting) — the manual lever next to AQE.

AQE's skew-join rule (on in ``session.get_spark``) splits oversized
sort-merge partitions at runtime, which covers most cases. Salting is
the explicit form for when the planner can't help: shuffle-hash
joins, skew on the *aggregation* side of a join key, or engines/
stages where AQE is off. The classic recipe: append a salt in
``[0, n)`` to the skewed side's join key (splitting each hot key into
``n`` sub-keys that hash to different reducers) and replicate the
other side ``n``× so every sub-key still finds its match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: Join types whose semantics survive replicating ``other`` n_salts×:
#: every `other` row that matches still matches exactly once per salt
#: bucket, and unmatched `other` rows are never emitted. 'right'/'full'
#: would emit each unmatched `other` row n_salts times — rejected.
_SALT_SAFE_HOW = frozenset({"inner", "left", "left_outer", "left_semi", "left_anti"})


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the skewed side's hot keys split over ``n_salts``
    reducers.

    ``skewed``: the side with hot keys (e.g. a fact table where one
    user/symbol dominates). Each row gets a deterministic salt —
    ``xxhash64`` of ``salt_cols`` (default: the whole row) mod
    ``n_salts`` — so the same input always produces the same
    partitioning (no ``rand()``: deterministic plans re-execute
    identically under task retries, which nondeterministic salting
    does not guarantee).

    ``other``: replicated ``n_salts``× via an exploded literal range —
    at 100 TB this trades ``n_salts``× duplication of the smaller side
    for eliminating the single hot reducer that otherwise runs as long
    as the whole rest of the stage. Result columns and semantics equal
    the plain ``skewed.join(other, on, how)`` for ``how`` in
    ``{'inner','left','left_semi','left_anti'}``; 'right'/'full' are
    rejected because the replicated side would emit unmatched rows
    ``n_salts`` times.

    Limitation — byte-identical duplicate rows: the deterministic salt
    is a pure function of the salted columns, so a hot key whose rows
    are *byte-identical* (common in denormalized logs) all land on ONE
    salt bucket and the hot reducer survives. When a finer
    deterministic discriminator exists (an event id, an offset), pass
    it via ``salt_cols``; when rows are truly identical, pre-aggregate
    (count per distinct row) before the join instead — duplicates
    carry no information a join can use.
    """
    if how not in _SALT_SAFE_HOW:
        raise ValueError(
            f"salted_join: how={how!r} is not salt-safe (replicating the "
            f"build side would duplicate its unmatched rows); use one of "
            f"{sorted(_SALT_SAFE_HOW)} or a plain join"
        )
    cols = salt_cols if salt_cols is not None else skewed.columns
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast(
        "int"
    )
    s = skewed.withColumn("__salt", salt)
    o = other.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    return s.join(o, [*on, "__salt"], how).drop("__salt")


def misra_gries_candidates(
    df: DataFrame, key_col: str, k: int
) -> DataFrame:
    """Per-partition Misra-Gries heavy-key candidates (k counters).

    The frequent-items sketch (Misra & Gries 1982) in its mergeable
    form (Agarwal et al., "Mergeable Summaries", PODS'12): each
    partition maintains at most ``k`` (key, count) counters; Arrow
    batches fold in via vectorized ``value_counts``, and whenever
    the counter set exceeds ``k`` every counter is decremented by
    the (k+1)-th largest count and non-positive counters drop. The
    classical guarantee survives the batch-merge formulation: a
    partition's total decrement is at most ``n_p / (k+1)``, so any
    key with partition count above that threshold cannot vanish.
    Summed over partitions: **every key with global count
    > N/(k+1) appears in at least one partition's output** — the
    union of per-partition candidates is a provable superset of the
    heavy hitters, sized at most k x num_partitions no matter how
    large the key domain is. That bounded candidate set is the
    whole point at 100 TB: pass 2 counts ONLY the candidates
    (broadcast semi-join) instead of aggregating the full domain.

    Output: distinct candidate keys (one column, ``key_col``).
    The candidate *set* depends on partitioning; callers must treat
    it as a superset and verify with exact counts (pass 2), which
    makes the final result partitioning-independent.
    """
    field = df.schema[key_col]
    out_schema = f"`{key_col}` {field.dataType.simpleString()}"

    def part(batches):
        import pandas as pd  # noqa: PLC0415

        counters: dict = {}
        for pdf in batches:
            for key, c in pdf[key_col].dropna().value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                vals = sorted(counters.values(), reverse=True)
                dec = vals[k]  # (k+1)-th largest
                counters = {
                    key: c - dec for key, c in counters.items() if c > dec
                }
        yield pd.DataFrame({key_col: list(counters.keys())})

    return df.select(key_col).mapInPandas(part, schema=out_schema).distinct()
