"""Record linkage / entity resolution: edit-distance fuzzy matching at
corpus scale via deletion-neighborhood blocking.

The naive formulation — ``levenshtein(a, b) <= d`` over a self cross
join — is O(n²) and plans as a nested-loop: catastrophic at any real
table size. The scalable shape here is the SymSpell / FastSS deletion
neighborhood (Schulz & Mihov 2002; public SymSpell): every string emits
itself plus each single-character-deletion variant as BLOCK KEYS, and
two strings within edit distance 1 provably share at least one key —

- equal strings share the full string;
- a substitution at position i makes both i-deletions equal;
- an insertion/deletion makes the shorter string itself a variant of
  the longer.

So an equi-join on the variant key finds every candidate (completeness
holds for distance <= 1), and an exact ``levenshtein`` verify discards
the false ones (e.g. "ab"/"ba" share variant "a" but are distance 2).

Scale design (the 100 TB contract):

- The only shuffle carries O(n·L) (id, variant) keys — L = string
  length — instead of O(n²) pairs; the equi-join is a plain shuffled
  hash join on the variant, AQE-skew-splittable like any other.
- Block sizes are tiny for near-unique strings; EXACT-duplicate name
  clusters pairwise-match by definition (quadratic in the cluster is
  the correct output size, not a plan flaw) — run exact dedup first if
  clusters are known to be huge.
- The verify is JVM codegen ``levenshtein`` on the candidate pairs
  only, never on the cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    *,
    max_distance: int = 1,
) -> DataFrame:
    """All pairs of rows whose ``name_col`` values are within
    ``max_distance`` Levenshtein edits (0 or 1 — the deletion
    neighborhood of depth 1 is complete exactly up to distance 1;
    deeper matching needs depth-d variants and is out of scope).
    Returns (id_a, id_b, name_a, name_b, distance) with id_a < id_b,
    each pair once.
    """
    if max_distance not in (0, 1):
        raise ValueError(
            "fuzzy_match_pairs supports max_distance 0 or 1 (the "
            f"1-deletion neighborhood), got {max_distance}"
        )
    base = df.select(
        F.col(id_col).alias("__id"), F.col(name_col).alias("__name")
    ).filter(F.col("__name").isNotNull())
    if max_distance == 0:
        variants = F.array(F.col("__name"))
    else:
        # index 0 = the string itself; index i>=1 = delete char i
        variants = F.expr(
            "transform(sequence(0, length(__name)), i -> "
            "CASE WHEN i = 0 THEN __name "
            "ELSE concat(substring(__name, 1, i-1), substring(__name, i+1)) "
            "END)"
        )
    keyed = base.select(
        "__id", "__name", F.explode(variants).alias("__blk")
    )
    a = keyed.toDF("id_a", "name_a", "__blk")
    b = keyed.toDF("id_b", "name_b", "__blk")
    cands = (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
    )
    return cands.withColumn(
        "distance", F.levenshtein("name_a", "name_b").cast("long")
    ).filter(F.col("distance") <= max_distance)
