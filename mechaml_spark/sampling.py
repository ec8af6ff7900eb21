"""Deterministic hash-based sampling — how a training-data pipeline
takes "50% of English, 25% of German, 10% of everything else" out of
a 100-TB corpus.

Why hash sampling and not ``rand()``: a Spark task that fails and
retries re-evaluates its partition, and ``rand()`` gives the retry a
DIFFERENT sample — silent corruption under fault recovery.  A salted
md5 over a stable row key is pure and per-row, so the sample is
reproducible across retries, partitionings, parallelism levels, AND
engines (md5 is md5 everywhere — the DuckDB oracles recompute it
exactly).  Changing the salt draws an independent sample; keeping it
pins the sample forever (the "holdout that never moves" property
eval sets need).

Everything is expression-only (md5 + conv are JVM expressions) —
codegen, no shuffle: sampling is a pure filter, so it pushes down
past joins and prunes before expensive downstream stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^32 — the uniform's modulus: 8 hex digits of the md5.
M32 = 1 << 32


def hash_uniform_col(key: Column, salt: str) -> Column:
    """Deterministic uniform in [0, 2^32) from a salted md5 of the
    row key: ``int(md5(salt ':' key)[0:8], 16)``.  The salt namespaces
    draws — the same key sampled for two purposes must not correlate."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def threshold_for(rate: float) -> int:
    """Exact integer threshold for a keep-rate: u < rate * 2^32.
    Exact for dyadic rates (0.5, 0.25, ...); floor otherwise."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate {rate!r} outside [0, 1]")
    return int(rate * M32)


def sample(df: DataFrame, rate: float, key_col: str, salt: str) -> DataFrame:
    """Uniform deterministic sample: keep rows with
    ``hash_uniform(key) < rate * 2^32``."""
    u = hash_uniform_col(F.col(key_col), salt)
    return df.where(u < F.lit(threshold_for(rate)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    salt: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps rows with
    ``u < rates.get(s, default_rate) * 2^32``.  The rates map is tiny
    (languages, sources) and folds into ONE case expression — no join,
    no broadcast, pure codegen filter."""
    u = hash_uniform_col(F.col(key_col), salt)
    thr = F.lit(threshold_for(default_rate))
    for s, r in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == s, F.lit(threshold_for(r))).otherwise(
            thr
        )
    return df.where(u < thr)


def split_column(
    key: Column, salt: str, bounds: dict[str, float]
) -> Column:
    """Disjoint deterministic train/val/test assignment: ``bounds``
    maps split name -> cumulative upper bound (e.g. ``{"train": .8,
    "val": .9, "test": 1.0}``); a row lands in the first split whose
    bound exceeds its uniform.  Same u as :func:`hash_uniform_col`,
    so splits are stable forever and mutually exclusive by
    construction."""
    items = sorted(bounds.items(), key=lambda kv: kv[1])
    if items[-1][1] < 1.0:
        raise ValueError("last bound must be 1.0 (cover the whole line)")
    u = hash_uniform_col(key, salt)
    # build outermost-last so the SMALLEST bound is checked first
    out = F.lit(items[-1][0])
    for name, b in reversed(items[:-1]):
        out = F.when(u < F.lit(threshold_for(b)), F.lit(name)).otherwise(out)
    return out


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    key_col: str,
    salt: str,
) -> DataFrame:
    """Keep at most ``cap`` rows per group — the corpus-balancing move
    ("no more than N pages per registered domain") that stops one SEO
    farm from being 3% of the training set.

    Selection is by salted-md5 order with the row key as tie-break,
    NOT rand(): deterministic across retries, partitionings, AND
    engines, and changing the salt redraws the quota sample without
    touching any other draw.  Adds ``grp_rank`` (1-based).

    Scale: one window per group key.  A pathologically hot group
    (every page of one domain) is the politeness-window skew case;
    the salted two-phase top-B in frontier/scheduler.py is the
    documented upgrade when a group no longer fits one task — same
    semantics, provably equal output."""
    from pyspark.sql import Window as _W

    u = hash_uniform_col(F.col(key_col), salt)
    w = _W.partitionBy(group_col).orderBy(u.asc(), F.col(key_col).asc())
    return (
        df.withColumn("grp_rank", F.row_number().over(w).cast("long"))
        .where(F.col("grp_rank") <= cap)
    )


def temperature_mixture(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    salt: str,
    target_total: int,
) -> tuple[DataFrame, DataFrame]:
    """Temperature-weighted domain mixing (alpha = 0.5) — the
    head-flattening resample every large-corpus training pipeline
    runs: source/domain d with n_d documents gets sampling weight
    ``w_d = floor(sqrt(n_d))``, and an expected ``target_total *
    w_d / sum(w)`` documents survive, so a domain 100x larger only
    contributes 10x more (multilingual pipelines use the same move
    over languages).

    Everything is exact integer arithmetic so the draw is
    reproducible across engines: per-domain keep threshold
    ``min(2^32, (target_total * 2^32 * w_d) div (sum_w * n_d))``
    compared against the salted-md5 uniform of the row key (the
    same retry-stable draw as :func:`sample` — no rand()).

    Returns ``(kept_rows, mixture_table)`` where ``mixture_table``
    has one row per domain: ``(domain, n_docs, weight, threshold,
    kept)``.  Scale posture: ONE partial-agg groupBy for the counts,
    a broadcast of the tiny per-domain rate table back onto the data,
    and a codegen filter — the 100-TB shape; no window, no skew
    (the filter is per-row, hot domains just filter harder)."""
    counts = (
        df.groupBy(domain_col)
        .agg(F.count("*").cast("long").alias("n_docs"))
        .withColumn(
            "weight", F.floor(F.sqrt(F.col("n_docs"))).cast("long")
        )
    )
    tot = counts.agg(F.sum("weight").alias("sum_w"))
    rates = counts.crossJoin(F.broadcast(tot)).withColumn(
        "threshold",
        F.least(
            F.lit(M32).cast("long"),
            F.expr(
                f"({target_total} * {M32}L * weight) "
                "div (sum_w * n_docs)"
            ),
        ),
    ).select(domain_col, "n_docs", "weight", "threshold")
    u = hash_uniform_col(F.col(key_col), salt)
    kept_rows = df.join(F.broadcast(rates), domain_col).where(
        u < F.col("threshold")
    )
    kept = kept_rows.groupBy(domain_col).agg(
        F.count("*").cast("long").alias("kept")
    )
    mixture = (
        rates.join(F.broadcast(kept), domain_col, "left")
        .withColumn("kept", F.coalesce(F.col("kept"), F.lit(0).cast("long")))
    )
    return kept_rows.drop("n_docs", "weight", "threshold"), mixture
