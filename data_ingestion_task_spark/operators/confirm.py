"""System-of-record confirmation rule engine — the decision core of
the reference's confirmation microservice, as a reusable DataFrame
stage. Lives in operators/ (not the api facade) so the registered
queries that exercise it (plans/extract_plans.sor_confirmation) do not
pull the whole facade — and everything the facade imports — into
their certification dep closure (the r7 lesson: a facade edit evicted
the extract family through one lazy import).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import normalize as N


def confirm_documents(
    df: DataFrame,
    doc_first: str,
    doc_last: str,
    doc_addr: str,
    sor_first: str,
    sor_last: str,
    sor_addr: str,
) -> DataFrame:
    """System-of-record validation confirmation as a reusable stage
    (conf_5_22.py rule spec; keyy_4_21.py 2-of-3 decision;
    confirmation_service.py's /confirm-document contract minus the
    Flask wrapper): nickname-canonicalized first-name match,
    case-folded last-name match, street-abbreviation-normalized
    address match → ``n_matches``, ``decision`` yes/no, ``confidence``
    and ``explanation`` — the service's response dict as columns."""

    def m(cond: Column) -> Column:
        return F.coalesce(cond.cast("int"), F.lit(0))

    fm = m(N.normalize_first_name(F.col(doc_first)) == N.normalize_first_name(F.col(sor_first)))
    lm = m(F.lower(F.trim(F.col(doc_last))) == F.lower(F.trim(F.col(sor_last))))
    am = m(
        N.normalize_street_address(F.col(doc_addr))
        == N.normalize_street_address(F.col(sor_addr))
    )
    n = fm + lm + am
    explanation = F.concat_ws(
        "; ",
        F.when(fm == 1, F.lit("first name matches")).otherwise(F.lit("first name differs")),
        F.when(lm == 1, F.lit("last name matches")).otherwise(F.lit("last name differs")),
        F.when(am == 1, F.lit("address matches")).otherwise(F.lit("address differs")),
    )
    return (
        df.withColumn("n_matches", n)
        .withColumn("decision", F.when(n >= 2, "yes").otherwise("no"))
        .withColumn("confidence", F.round(n.cast("double") / 3, 6))
        .withColumn("explanation", explanation)
    )
