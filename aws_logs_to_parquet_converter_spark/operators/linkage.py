"""Probabilistic record linkage (Fellegi–Sunter): score candidate
pairs from two sources by summing per-field agreement log-weights —
the classic entity-resolution decision model (Fellegi & Sunter 1969,
"A Theory for Record Linkage"), the model behind Splink/dedupe.io.

Division of labor with the neighbors in this package:
``operators/fuzzy.py`` finds pairs whose KEY STRINGS are within edit
distance; SimHash/MinHash find near-identical CONTENT; this module
scores STRUCTURED pairs (name + balance + segment + ...) where no
single field is trustworthy but agreement patterns are.

Weights are INPUTS in integer milli-bans (w = round(1000·log2(m/u)),
m = P(agree | match), u = P(agree | non-match)) — in production they
come from an upstream EM fit or labeled data; taking them as integers
keeps every score an exact BIGINT sum, so an oracle matches
bit-for-bit.  Missing data follows the standard FS treatment: a NULL
on either side contributes ZERO weight (no information), not a
disagreement.

Scale shape: candidate generation is a blocked EQUI-join — the
blocking-key cardinality is the O(n²)-confinement lever exactly as in
the LSH/SymSpell families (pairs per block ≈ |L||R|/|blocks| under a
uniform key).  Scoring is a map-side expression over the joined rows;
no window, no second shuffle.  At 100 TB the join shuffles only the
id + block + field columns, never whole records.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class LinkField(NamedTuple):
    """One comparison field: column name (present in BOTH frames) and
    its agreement / disagreement weights in milli-bans."""

    col: str
    agree_milli: int
    disagree_milli: int


def fellegi_sunter_link(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    block_cols: list[str],
    fields: list[LinkField | tuple],
    threshold_milli: int = 0,
) -> DataFrame:
    """Blocked Fellegi–Sunter linkage of ``left`` × ``right``.

    Returns (left_id, right_id, n_agree, n_disagree, score_milli) for
    every blocked pair with ``score_milli >= threshold_milli``, where
    ``score_milli = Σ_fields (agree ? w_a : disagree ? w_d : 0)`` and
    agree/disagree require both sides non-NULL.

    ``block_cols`` and every field column must exist in both frames;
    only id + block + field columns travel through the join.
    """
    fs = [LinkField(*f) for f in fields]
    if not fs:
        raise ValueError("fellegi_sunter_link: at least one field required")
    if not block_cols:
        # no blocking = |L|x|R| cartesian pair space; this engine never
        # emits CartesianProduct (plan-sweep banned) — demand a key.
        raise ValueError("fellegi_sunter_link: block_cols must be non-empty")
    lsel = left.select(
        F.col(left_id).alias("_lid"),
        *[F.col(c).alias(f"_b_{c}") for c in block_cols],
        *[F.col(f.col).alias(f"_l_{f.col}") for f in fs],
    )
    rsel = right.select(
        F.col(right_id).alias("_rid"),
        *[F.col(c).alias(f"_rb_{c}") for c in block_cols],
        *[F.col(f.col).alias(f"_r_{f.col}") for f in fs],
    )
    cond = [F.col(f"_b_{c}") == F.col(f"_rb_{c}") for c in block_cols]
    pairs = lsel.join(rsel, cond[0] if len(cond) == 1 else cond, "inner")

    score_terms, agree_terms, disagree_terms = [], [], []
    for f in fs:
        l, r = F.col(f"_l_{f.col}"), F.col(f"_r_{f.col}")
        both = l.isNotNull() & r.isNotNull()
        agree, disagree = both & (l == r), both & (l != r)
        score_terms.append(
            F.when(agree, F.lit(int(f.agree_milli)).cast("long"))
            .when(disagree, F.lit(int(f.disagree_milli)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        agree_terms.append(F.when(agree, 1).otherwise(0))
        disagree_terms.append(F.when(disagree, 1).otherwise(0))

    def _total(terms):
        acc = terms[0]
        for term in terms[1:]:
            acc = acc + term
        return acc

    score = _total(score_terms).alias("score_milli")
    n_agree = _total(agree_terms).cast("long").alias("n_agree")
    n_disagree = _total(disagree_terms).cast("long").alias("n_disagree")

    out = pairs.select(
        F.col("_lid").alias(left_id),
        F.col("_rid").alias(right_id),
        n_agree,
        n_disagree,
        score,
    )
    return out.where(F.col("score_milli") >= F.lit(int(threshold_milli)))
