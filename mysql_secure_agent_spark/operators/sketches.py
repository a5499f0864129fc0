"""Mergeable cardinality sketches (HyperLogLog) as pure Catalyst plans.

The ask at 10^10 events: "distinct users per window/segment, refreshed
incrementally, mergeable across shards and days" — an exact
count(distinct) re-shuffles every value on every refresh, while an HLL
register table is O(m) per group, mergeable with an element-wise max,
and never revisits history. Algorithm per the public papers (Flajolet
et al. 2007 HyperLogLog; Heule et al. 2013 HLL++ for the bias notes):
hash → p index bits pick a register, ρ = leading-zero count of the
remaining bits + 1, register keeps max ρ; estimate = α·m²/Σ2^-reg with
the small-range linear-counting correction.

Spark-first shape: the sketch's NATIVE form here is rows of
``(group, reg_idx, rho)`` — a groupBy(group, idx).max(rho), which
Catalyst executes with map-side partial aggregation, so the shuffle
carries at most m rows per group per map partition no matter how many
billions of values flowed in. Merging shards/days is literally the same
max — an HLL register table stored in the lake IS an incremental
distinct-count view (pair with ``operators/incremental_agg``). The
array-blob form most engines expose is only a final packaging step.

No UDF anywhere; ρ itself is integer-exact via ``length(bin(w))``
(bit-length — identical in DuckDB, which is what makes the estimator
oracle-checkable bit-for-bit; ``floor(log2(w))`` would hinge on libm
rounding at exact powers of two).

Two hash tiers, same estimator (the ``operators/text_dedup`` pattern):
``md5`` — portable 32-bit (first 8 md5 hex chars), reproducible in any
engine, used by the oracle-gated entry query; ``xxhash64`` — the
production path: cheaper, 64-bit, so register-collision saturation is
irrelevant at any realistic cardinality (the reason HLL++ drops the
32-bit large-range correction; with ``md5`` keep cardinalities ≪ 2^32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text_dedup import _h32


def _hash_bits(value_col, hash_fn: str):
    """(hash column, total hash bits) for the chosen tier."""
    c = F.col(value_col).cast("string")
    if hash_fn == "md5":
        return _h32(c), 32
    if hash_fn == "xxhash64":
        return F.xxhash64(c), 64
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 12,
    hash_fn: str = "md5",
) -> DataFrame:
    """The sketch in its shuffle-native form: one row per (group, touched
    register) with the max ρ. NULL values are not counted (SQL distinct
    semantics). Output: ``group_cols + [reg_idx int, rho int]``."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    h, bits = _hash_bits(value_col, hash_fn)
    m = 1 << p
    w = F.shiftrightunsigned(h, p)  # remaining (bits - p) hash bits
    rho_max = bits - p + 1
    rho = F.when(w == 0, F.lit(rho_max)).otherwise(
        F.lit(rho_max) - F.length(F.bin(w))
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            F.pmod(h, F.lit(m)).cast("int").alias("reg_idx"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "reg_idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables (shards, days, tables): element-wise max —
    the lossless HLL union. Input rows from ANY number of sketches built
    with the same (p, hash_fn)."""
    return regs.groupBy(*group_cols, "reg_idx").agg(F.max("rho").alias("rho"))


def hll_estimate(
    regs: DataFrame, group_cols: list[str], p: int = 12
) -> DataFrame:
    """Registers → approx distinct count per group (column ``approx``,
    double). Small-range correction: linear counting on the zero-register
    count when E ≤ 2.5m — the regime micro-batch groups live in. All the
    float math is deterministic across engines: Σ2^-ρ sums dyadic
    rationals exactly (≤ 2^p terms of granularity 2^-(rho_max) fit double
    exactly), α is a shared literal, and ln() only enters the
    linear-counting branch where a ulp of libm drift is far below the
    9-significant-digit comparison."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)  # Flajolet et al., m >= 128
    per = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s_hit"),
        F.count(F.lit(1)).alias("_n_hit"),
    )
    zeros = F.lit(m) - F.col("_n_hit")  # untouched registers (ρ = 0)
    raw = F.lit(alpha * m * m) / (F.col("_s_hit") + zeros)  # zeros add 2^0
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return per.select(*group_cols, est.alias("approx"))


def cms_rows(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    d: int = 4,
    w: int = 1024,
    weight_col: str | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) in its
    shuffle-native form: rows ``group_cols + [cm_row, cm_idx, cnt]`` —
    d salted hash rows × w counters, each counter the SUM of weights
    whose value hashed into it. Built with one explode(d) + one
    groupBy(sum) (map-side partial agg: the shuffle carries ≤ d·w rows
    per group per map partition, never the raw stream). Merging
    shards/days/tables is the same sum (``cms_merge``) — a CMS table in
    the lake is an incremental heavy-hitter view over 10^10 events in
    O(d·w) space per group.

    Counts are INTEGERS, so unlike most sketches the whole estimator is
    exactly reproducible in any engine sharing the portable hash — the
    entry query's oracle checks the estimates themselves. Estimates are
    one-sided: est ≥ true count, overshoot bounded by ε·N with
    ε = e/w at probability 1 − e^-d."""
    if hash_fn != "md5":
        raise ValueError("cms_rows is the portable tier; only md5 for now")
    weight = F.col(weight_col) if weight_col else F.lit(1)
    s = F.col(value_col).cast("string")
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("cm_row"),
                F.pmod(
                    _h32(F.concat(F.lit(str(i)), F.lit(":"), s)), F.lit(w)
                ).cast("int").alias("cm_idx"),
            )
            for i in range(d)
        ]
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, F.explode(pairs).alias("p"), weight.alias("_w"))
        .select(*group_cols, "p.cm_row", "p.cm_idx", "_w")
        .groupBy(*group_cols, "cm_row", "cm_idx")
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def cms_merge(cms: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge CMS tables (shards, days): element-wise counter sum."""
    return cms.groupBy(*group_cols, "cm_row", "cm_idx").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    cms: DataFrame,
    group_cols: list[str],
    probes: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Point-query the sketch: for each probe row (its ``value_col`` plus
    any ``group_cols``), est = min over the d rows of the counter its
    salted hash lands in. Probes are expected small (the candidate heavy
    hitters); the join broadcasts them. Missing counters count 0 (the
    value never hashed there). Output: probes' columns + ``cms_n``."""
    s = F.col(value_col).cast("string")
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("cm_row"),
                F.pmod(
                    _h32(F.concat(F.lit(str(i)), F.lit(":"), s)), F.lit(w)
                ).cast("int").alias("cm_idx"),
            )
            for i in range(d)
        ]
    )
    px = probes.select(*probes.columns, F.explode(pairs).alias("p")).select(
        *probes.columns, "p.cm_row", "p.cm_idx"
    )
    joined = px.join(cms, [*group_cols, "cm_row", "cm_idx"], "left")
    return (
        joined.groupBy(*probes.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_n"))
    )


def histogram_rows(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Equi-width histogram sketch: rows ``group_cols + [bin, cnt]`` —
    the mergeable quantile sketch (merge = counter sum, like CMS). One
    groupBy-sum with map-side combine: ≤ ``bins`` rows per group per map
    partition on the wire regardless of input volume; a histogram table
    in the lake is an incremental percentile view (p50/p95/p99 latency
    rollups at 10^10 events without re-sorting anything).

    Binning uses ONLY IEEE basic ops (sub/mul/div/floor), so the sketch —
    and the quantile estimates derived from it — reproduce bit-for-bit in
    any engine given the same (lo, hi, bins); no libm, no rounding
    ambiguity. Values outside [lo, hi] clamp into the edge bins (the
    standard histogram convention; pick bounds from a prior scalar agg).
    Estimate error is bounded by one bin width — chosen, not stochastic.
    """
    v = F.col(value_col).cast("double")
    width = (hi - lo) / bins
    b = F.floor((v - F.lit(float(lo))) / F.lit(float(width))).cast("int")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def histogram_merge(rows: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge histogram sketches (shards, days): per-bin count sum."""
    return rows.groupBy(*group_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    rows: DataFrame,
    group_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Histogram rows → per-group quantile estimates: for each q, find the
    first bin whose cumulative count reaches q·N and interpolate linearly
    inside it. O(bins) per group (a window over the bins, never the data).
    Output: ``group_cols + [q, est]``."""
    from pyspark.sql import Window

    width = (hi - lo) / bins
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*group_cols)
    cum = rows.select(
        *group_cols,
        "bin",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("total"),
    )
    qdf = cum.select(
        "*", F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    target = F.col("q") * F.col("total")
    hit = qdf.filter(
        (F.col("cum") >= target) & ((F.col("cum") - F.col("cnt")) < target)
    )
    frac = (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
    est = F.lit(float(lo)) + (F.col("bin") + frac) * F.lit(float(width))
    return hit.select(*group_cols, "q", est.alias("est"))


def approx_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 12,
    hash_fn: str = "md5",
) -> DataFrame:
    """groupBy(group).approx_count_distinct(value) — but mergeable,
    incremental, and (with hash_fn='md5') oracle-reproducible. One
    two-level aggregation: (group, idx) partial max, then the O(m)
    estimate fold."""
    return hll_estimate(
        hll_registers(df, group_cols, value_col, p, hash_fn), group_cols, p
    )
