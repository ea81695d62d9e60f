"""Bloom-filter semi-join reduction, expressed entirely in DataFrame
algebra (SURVEY.md §2.5 scale ops — shuffle-volume reduction).

The 100 TB problem: joining a huge fact table to a filtered key set
shuffles every fact row, even though most will not match. A broadcast
hash semi-join fixes that only while the key set is broadcast-sized.
The Bloom filter covers the middle regime — a key set too big to
broadcast as a hash table but whose BITMAP (m bits ≈ 1.2 bytes/key at
1% fpp with k=7, or ~2 bits/key at k=2 and higher fpp) still fits:
prune the fact side BEFORE its shuffle, then run the exact join; false
positives are eliminated by the join itself, false negatives cannot
occur, so results are bit-identical to the plain join.

Spark 4 ships a runtime bloom rewrite (``spark.sql.optimizer.
runtimeFilter.bloomFilter.enabled``) but exposes no SQL
``bloom_filter_agg``; this operator builds the same structure from
public primitives, fully JVM-side:

- **Build**: each key row explodes to ``k`` seeded positions
  ``pmod(xxhash64(key, seed), m)``; positions aggregate into a SPARSE
  bitmap table ``(word, bit_or(mask))`` of at most m/64 rows — a
  map-side-combined groupBy, never a driver-side bitset.
- **Probe**: the fact side computes the same k (word, mask) pairs and
  left-joins the **broadcast** bitmap once per seed (k tiny broadcast
  hash joins, no shuffle of the fact table); a row survives only if
  every seed's bit is set.

No Python or UDFs anywhere — whole-stage codegen applies end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pos(key: Column, seed: int, m_bits: int) -> Column:
    """Seeded bit position: pmod(xxhash64(key, seed), m)."""
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits))


def build_bloom_bitmap(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Aggregate the key set into a sparse Bloom bitmap: one row per
    64-bit word that has any bit set — ``(word long, bits long)``.
    At most m_bits/64 rows regardless of key count."""
    seeds = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("_seed")
    pos = F.pmod(F.xxhash64(F.col(key_col), F.col("_seed")), F.lit(m_bits))
    return (
        keys.select(F.col(key_col), seeds)
        .select(pos.alias("_pos"))
        .select(
            (F.col("_pos") / 64).cast("long").alias("word"),
            # pyspark's F.shiftleft takes a literal; the SQL builtin
            # accepts a column shift amount
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").alias(
                "_mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def bloom_prefilter(
    fact: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Keep only fact rows whose key hits ALL k Bloom positions — a
    superset of the true matches (false positives possible, false
    negatives impossible). k broadcast joins of the ≤ m/64-row bitmap;
    the fact table is never shuffled here."""
    # withColumn silently REPLACES same-named columns, so a fact table
    # that already carries one of our temp names would lose data (and
    # the probe could hash the wrong column). Fail loudly instead.
    temp = {"_p", "_w", "_m", *(f"_b{i}" for i in range(k))}
    clash = temp.intersection(fact.columns)
    if clash:
        raise ValueError(
            f"bloom_prefilter temp columns {sorted(clash)} already exist in the "
            "fact table; rename them before filtering"
        )
    out = fact
    for i in range(k):
        pos = _pos(F.col(key_col), i, m_bits)
        out = (
            out.withColumn("_p", pos)
            .withColumn("_w", (F.col("_p") / 64).cast("long"))
            .withColumn(
                "_m", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT))")
            )
            .drop("_p")
            .join(
                F.broadcast(
                    bitmap.select(
                        F.col("word").alias("_w"), F.col("bits").alias(f"_b{i}")
                    )
                ),
                "_w",
                "left",
            )
            .filter(F.coalesce(F.col(f"_b{i}"), F.lit(0)).bitwiseAND(F.col("_m")) != 0)
            .drop("_w", "_m", f"_b{i}")
        )
    return out


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str | None = None,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Exact inner join of ``fact`` to ``keys``, Bloom-pruned: the fact
    side is pre-filtered through the key bitmap before the (shuffling)
    join, so shuffle volume is proportional to probable matches instead
    of the whole table. Results are identical to the plain join —
    Bloom false positives are dropped by the join itself."""
    keys_key = keys_key or fact_key
    bitmap = build_bloom_bitmap(keys, keys_key, m_bits, k)
    pruned = bloom_prefilter(fact, bitmap, fact_key, m_bits, k)
    return pruned.join(keys, pruned[fact_key] == keys[keys_key])
