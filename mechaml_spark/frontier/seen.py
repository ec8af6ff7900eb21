"""Partitioned bloom-filter URL-seen set with exact anti-join backstop.

North-rule requirement: canonicalized + murmur3/xxhash-hashed URLs,
sharded by host-hash to kill skew, with **exact** final membership
(the bloom is only a prefilter — north rule demands the seen set be
exact, so every bloom "maybe" is verified by a left_anti join
against the authoritative seen table).

Scale design (10^10 URLs):
  * the seen table is parquet partitioned by ``host_shard``
    (``pmod(xxhash64(host), n_shards)``) — the anti-join shuffles
    only bloom survivors, co-partitioned by shard;
  * blooms are one bitset row per shard (``n_bits/8`` bytes each),
    updated via ``applyInPandas`` over candidate groups co-grouped
    with the existing bitset rows — no driver round-trip, no
    broadcast of the full filter set;
  * bit positions come from k xxhash64 values computed JVM-side
    (``F.xxhash64(url, seed_i)``), so probe and insert agree by
    construction.

False-positive budget: with n_bits=2^23 per shard, k=4, a shard
holds ~1M URLs at <1% FPR; at 10^10 total URLs use 4096 shards and
2^26 bits (512 MiB of bloom state cluster-wide — trivially
broadcastable per-shard via cogroup).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_T = T.StructType(
    [
        T.StructField("host_shard", T.IntegerType(), False),
        T.StructField("bits", T.BinaryType()),
    ]
)

SEEN_T = T.StructType(
    [
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("host_shard", T.IntegerType(), False),
    ]
)

K_HASHES = 4


def host_shard_col(host, n_shards: int):
    return F.pmod(F.xxhash64(host), F.lit(n_shards)).cast("int")


def _bit_position_cols(url, n_bits: int):
    """K bit positions as K SCALAR long columns (``_b0.._bK``).

    An ``array<long>`` column materializes a Python list object per
    row on the pandas side — at millions of candidate rows per epoch
    that dominates the probe's CPU.  Scalar columns arrive as numpy
    arrays and stack for free."""
    return [
        F.pmod(F.xxhash64(url, F.lit(i)), F.lit(n_bits)).cast("long").alias(f"_b{i}")
        for i in range(K_HASHES)
    ]


class SeenSet:
    """Seen-set = (exact parquet-backed table, per-shard bloom rows).

    Both halves live as DataFrames so snapshots capture them; the
    class only carries the handles + sizing config.
    """

    def __init__(
        self,
        spark: SparkSession,
        n_shards: int = 16,
        n_bits: int = 1 << 23,
        seen_df: DataFrame | None = None,
        bloom_df: DataFrame | None = None,
    ) -> None:
        self.spark = spark
        self.n_shards = n_shards
        self.n_bits = n_bits
        self.seen_df = seen_df if seen_df is not None else spark.createDataFrame([], SEEN_T)
        self.bloom_df = bloom_df if bloom_df is not None else spark.createDataFrame([], BLOOM_T)

    # ------------------------------------------------------------- helpers
    def _with_keys(self, df: DataFrame, url_col: str, host_col: str) -> DataFrame:
        return df.select(
            "*",
            host_shard_col(F.col(host_col), self.n_shards).alias("host_shard"),
            *_bit_position_cols(F.col(url_col), self.n_bits),
        )

    # --------------------------------------------------------------- probe
    def filter_new(
        self, candidates: DataFrame, url_col: str = "url_norm", host_col: str = "host"
    ) -> DataFrame:
        """Rows of ``candidates`` whose URL is NOT in the seen set.

        Bloom prefilter via cogrouped applyInPandas (co-partitioned by
        shard), then exact left_anti for bloom-positives only.
        """
        cand = self._with_keys(candidates, url_col, host_col)
        bcols = ["_b%d" % i for i in range(K_HASHES)]
        out_schema = T.StructType(
            [f for f in cand.schema.fields if f.name not in bcols]
            + [T.StructField("_maybe_seen", T.BooleanType())]
        )
        pass_cols = [f.name for f in cand.schema.fields if f.name not in bcols]

        def probe(cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
            if cand_pdf.empty:
                return pd.DataFrame(columns=pass_cols + ["_maybe_seen"])
            out = cand_pdf[pass_cols].copy()
            if bloom_pdf.empty or bloom_pdf["bits"].iloc[0] is None:
                out["_maybe_seen"] = False
                return out
            bits = np.frombuffer(bloom_pdf["bits"].iloc[0], dtype=np.uint8)
            pos = np.stack(
                [cand_pdf[c].to_numpy(dtype=np.int64) for c in bcols], axis=1
            )
            mask = (1 << (pos & 7)).astype(np.uint8)
            out["_maybe_seen"] = np.all(bits[pos >> 3] & mask == mask, axis=1)
            return out

        probed = (
            cand.groupBy("host_shard")
            .cogroup(self.bloom_df.groupBy("host_shard"))
            .applyInPandas(probe, schema=out_schema)
        )
        definitely_new = probed.where(~F.col("_maybe_seen")).drop("_maybe_seen")
        maybe = probed.where(F.col("_maybe_seen")).drop("_maybe_seen")
        verified_new = maybe.join(
            self.seen_df.select(F.col("url_norm").alias(url_col)),
            on=url_col,
            how="left_anti",
        )
        return definitely_new.unionByName(verified_new).drop("host_shard")

    # ------------------------------------------- fused probe + bloom update
    def probe_dedup_update(
        self,
        candidates: DataFrame,
        url_col: str = "url_norm",
        host_col: str = "host",
    ) -> DataFrame:
        """ONE cogrouped pass over ``candidates`` x blooms per shard:

        1. shard-local dedup (same URL -> same host -> same shard):
           min depth, any host, OR of ``is_hop``;
        2. bloom probe (``_maybe_seen``);
        3. bloom update: the new shard bitset ORs in the bits of EVERY
           candidate — correct regardless of the later exact anti-join,
           because a candidate is either bloom-negative (genuinely new,
           bits must be set) or bloom-positive (its bits are already
           set, so the OR is a no-op).  This removes the separate
           ``add`` shuffle from the superstep.

        Output rows are a tagged union: candidate rows carry
        ``bits IS NULL``; one bloom row per shard carries the updated
        bitset in ``bits`` (and NULL url).  Split downstream with two
        filters over one (lazily checkpointed) result.

        Requires candidate columns ``(url_col, host_col, depth, is_hop)``.
        """
        cand = self._with_keys(candidates, url_col, host_col)
        out_schema = T.StructType(
            [
                T.StructField("host_shard", T.IntegerType(), False),
                T.StructField(url_col, T.StringType()),
                T.StructField(host_col, T.StringType()),
                T.StructField("depth", T.IntegerType()),
                T.StructField("is_hop", T.BooleanType()),
                T.StructField("_maybe_seen", T.BooleanType()),
                T.StructField("bits", T.BinaryType()),
            ]
        )
        n_bytes = self.n_bits // 8

        def fused(cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
            cols = [
                "host_shard", url_col, host_col, "depth", "is_hop",
                "_maybe_seen", "bits",
            ]
            have_bloom = (
                not bloom_pdf.empty and bloom_pdf["bits"].iloc[0] is not None
            )
            if cand_pdf.empty:
                if not have_bloom:
                    return pd.DataFrame(columns=cols)
                shard = int(bloom_pdf["host_shard"].iloc[0])
                return pd.DataFrame(
                    {
                        "host_shard": [shard],
                        url_col: [None],
                        host_col: [None],
                        "depth": [None],
                        "is_hop": [None],
                        "_maybe_seen": [None],
                        "bits": [bloom_pdf["bits"].iloc[0]],
                    }
                )
            shard = int(cand_pdf["host_shard"].iloc[0])
            if have_bloom:
                bits = np.frombuffer(
                    bloom_pdf["bits"].iloc[0], dtype=np.uint8
                ).copy()
            else:
                bits = np.zeros(n_bytes, dtype=np.uint8)
            # shard-local dedup (vectorized groupby)
            bcols = ["_b%d" % i for i in range(K_HASHES)]
            g = cand_pdf.groupby(url_col, sort=False)
            dd = g.agg(
                **{
                    host_col: (host_col, "first"),
                    "depth": ("depth", "min"),
                    "is_hop": ("is_hop", "max"),
                    **{c: (c, "first") for c in bcols},
                }
            ).reset_index()
            pos = np.stack(
                [dd[c].to_numpy(dtype=np.int64) for c in bcols], axis=1
            )  # (n, K_HASHES)
            byte_idx = pos >> 3
            mask = (1 << (pos & 7)).astype(np.uint8)
            maybe = np.all(
                bits[byte_idx] & mask == mask, axis=1
            )
            np.bitwise_or.at(bits, byte_idx.ravel(), mask.ravel())
            out = pd.DataFrame(
                {
                    "host_shard": shard,
                    url_col: dd[url_col],
                    host_col: dd[host_col],
                    "depth": dd["depth"].astype("Int32"),
                    "is_hop": dd["is_hop"].astype(bool),
                    "_maybe_seen": maybe,
                    "bits": None,
                }
            )
            bloom_row = pd.DataFrame(
                {
                    "host_shard": [shard],
                    url_col: [None],
                    host_col: [None],
                    "depth": [None],
                    "is_hop": [None],
                    "_maybe_seen": [None],
                    "bits": [bits.tobytes()],
                }
            )
            import warnings

            with warnings.catch_warnings():
                # concat of the all-NA bloom tag row vs typed candidate
                # rows trips a pandas FutureWarning; the Arrow schema
                # cast downstream fixes dtypes either way
                warnings.simplefilter("ignore", FutureWarning)
                return pd.concat([out, bloom_row], ignore_index=True)

        return (
            cand.groupBy("host_shard")
            .cogroup(self.bloom_df.groupBy("host_shard"))
            .applyInPandas(fused, schema=out_schema)
        )

    # --------------------------------------------------------------- update
    def add(self, new_urls: DataFrame, url_col: str = "url_norm",
            host_col: str = "host") -> "SeenSet":
        """Return a new SeenSet with ``new_urls`` inserted (both the
        exact table and the shard blooms)."""
        cand = self._with_keys(new_urls.select(url_col, host_col), url_col, host_col)
        seen_new = self.seen_df.unionByName(
            cand.select(F.col(url_col).alias("url_norm"), "host_shard")
        )
        n_bytes = self.n_bits // 8

        def rebuild(cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
            if cand_pdf.empty and bloom_pdf.empty:
                return pd.DataFrame(columns=["host_shard", "bits"])
            if not bloom_pdf.empty and bloom_pdf["bits"].iloc[0] is not None:
                bits = np.frombuffer(
                    bloom_pdf["bits"].iloc[0], dtype=np.uint8
                ).copy()
                shard = int(bloom_pdf["host_shard"].iloc[0])
            else:
                bits = np.zeros(n_bytes, dtype=np.uint8)
                shard = int(cand_pdf["host_shard"].iloc[0])
            if not cand_pdf.empty:
                bcols = ["_b%d" % i for i in range(K_HASHES)]
                pos = np.concatenate(
                    [cand_pdf[c].to_numpy(dtype=np.int64) for c in bcols]
                )
                np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            return pd.DataFrame({"host_shard": [shard], "bits": [bits.tobytes()]})

        bloom_new = (
            cand.select("host_shard", *["_b%d" % i for i in range(K_HASHES)])
            .groupBy("host_shard")
            .cogroup(self.bloom_df.groupBy("host_shard"))
            .applyInPandas(rebuild, schema=BLOOM_T)
        )
        return SeenSet(
            self.spark, self.n_shards, self.n_bits, seen_new, bloom_new
        )

    def persist(self) -> "SeenSet":
        # lazy local checkpoints: lineage is truncated immediately;
        # materialization folds into the next action that reads the
        # seen set (fewer driver round-trips per superstep)
        self.seen_df = self.seen_df.localCheckpoint(eager=False)
        self.bloom_df = self.bloom_df.localCheckpoint(eager=False)
        return self
