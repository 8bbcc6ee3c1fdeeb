"""Cleansing operators C1-C5, T1-T2, P2-P5 (SURVEY.md §2.2-§2.4).

Reproduces the reference's cleansing semantics — these rules are
load-bearing (raw metric columns are 43-75% null; null→0 defines the
aggregates, SURVEY.md C2) — as a single declarative select chain that
Catalyst pipelines into one whole-stage-codegen'd scan→project→filter.

Scale note: every operator here is a narrow transformation (no shuffle);
cleansing 100 TB is embarrassingly parallel and IO-bound, exactly as it
should be. The one join (P5 membership filter) broadcasts a 110-row dim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import MOBILITY_METRICS, TRAFFIC_METRICS

TIMESTAMP_FMT = "yyyy-MM-dd HH:mm:ss"

# T2: the reference's 7-entry province fixup map, verbatim
# (reference src/etl.py:217-225).
PROVINCE_FIXUPS = {
    "Monza E Della Brianza": "Monza e della Brianza",
    "Reggio Nell'Emilia": "Reggio nell'Emilia",
    "Reggio Di Calabria": "Reggio di Calabria",
    "Pesaro E Urbino": "Pesaro e Urbino",
    "Massa-Carrara": "Massa Carrara",
    "Valle D'Aosta": "Aosta",
    "Bolzano/Bozen": "Bolzano",
}

CELL_ID_MIN, CELL_ID_MAX = 0, 9999  # CHECK range, reference src/database.py:69


def parse_timestamp(col: str | Column, fmt: str = TIMESTAMP_FMT) -> Column:
    """C1: lenient timestamp parse — unparseable → null (same coerce
    semantics as pd.to_datetime(errors='coerce'),
    reference src/etl.py:134)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt))


def coerce_metric(name: str, columns: list[str]) -> Column:
    """C2+C3: lenient numeric cast, null→0; column absent → constant 0
    (reference src/etl.py:143-151,251-254)."""
    if name not in columns:
        return F.lit(0.0)
    return F.coalesce(F.col(name).try_cast("double"), F.lit(0.0))


def clamp_negative(col: Column) -> Column:
    """C4: negatives → 0 (traffic path only, reference src/etl.py:152-153)."""
    return F.greatest(col, F.lit(0.0))


def in_cell_range(col: str | Column = "cell_id") -> Column:
    """P3: CHECK-range predicate, inclusive (reference src/etl.py:155,265)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.between(CELL_ID_MIN, CELL_ID_MAX)


def title_trim(col: str | Column) -> Column:
    """T1: title-case + trim (reference src/etl.py:256-257).

    Parity caveat (SURVEY.md §7.4.2): pandas str.title() uppercases after
    ANY non-alpha (apostrophes, hyphens, slashes) while Spark initcap only
    capitalizes after whitespace. The reference's own fixup map (T2)
    exists to repair title-case artifacts; apply_fixups() carries both
    the pandas-artifact spellings and the initcap spellings so the final
    values agree with the reference regardless of which engine produced
    the intermediate.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.initcap(F.trim(c))


# Extra keys so that initcap-produced intermediates (which differ from
# pandas str.title() on apostrophe/hyphen/slash names) land on the same
# final values the reference produces.
_INITCAP_EXTRA_FIXUPS = {
    "Reggio Nell'emilia": "Reggio nell'Emilia",  # initcap leaves 'e' low
    "Massa-carrara": "Massa Carrara",
    "Valle D'aosta": "Aosta",
    "Bolzano/bozen": "Bolzano",
}


def apply_fixups(col: str | Column, fixups: dict[str, str] | None = None) -> Column:
    """T2: dictionary value-replace via a literal map lookup — stays
    JVM-side, no UDF (reference src/etl.py:217-225,258)."""
    c = F.col(col) if isinstance(col, str) else col
    mapping = dict(PROVINCE_FIXUPS, **_INITCAP_EXTRA_FIXUPS) if fixups is None else fixups
    lits: list[Column] = []
    for k, v in mapping.items():
        lits += [F.lit(k), F.lit(v)]
    return F.coalesce(F.element_at(F.create_map(*lits), c), c)


def cleanse_traffic(raw: DataFrame) -> DataFrame:
    """The traffic cleanse chain (reference src/etl.py:126-156 semantics):

    C1 parse → P4 drop null datetime → P2 rename CellID→cell_id →
    C2/C3 metric coerce/default → C4 clamp negatives → P3 cell range.

    One narrow select chain; Catalyst fuses it into the scan stage.
    """
    cols = raw.columns
    out = (
        raw.withColumn("datetime", parse_timestamp("datetime"))
        .filter(F.col("datetime").isNotNull())  # P4
        .withColumnRenamed("CellID", "cell_id")  # P2
    )
    for m in TRAFFIC_METRICS:
        out = out.withColumn(m, clamp_negative(coerce_metric(m, cols)))
    out = out.filter(in_cell_range("cell_id"))  # P3
    return out.select("datetime", "cell_id", "countrycode", *TRAFFIC_METRICS)


def cleanse_mobility(raw: DataFrame, provinces_dim: DataFrame) -> DataFrame:
    """The mobility cleanse chain (reference src/etl.py:232-265 semantics):

    C1/P4 → P2 renames → C2/C3 coerce (NO negative clamp — asymmetry
    preserved, SURVEY.md §3) → T1 title+trim → T2 fixups → P3 range →
    J1/P5 broadcast semi-join against the provinces dim.
    """
    out = (
        raw.withColumn("datetime", parse_timestamp("datetime"))
        .filter(F.col("datetime").isNotNull())
        .withColumnRenamed("CellID", "cell_id")
        .withColumnRenamed("provinceName", "provincia")
        .withColumnRenamed("cell2Province", "cell2province")
        .withColumnRenamed("Province2cell", "province2cell")
    )
    cols = out.columns
    for m in MOBILITY_METRICS:
        out = out.withColumn(m, coerce_metric(m, cols))  # no C4 clamp here
    out = (
        out.withColumn("provincia", apply_fixups(title_trim("provincia")))
        .filter(in_cell_range("cell_id"))
        .join(  # J1: 110-row dim ⇒ broadcast hash semi-join, no shuffle
            F.broadcast(provinces_dim.select("provincia")), "provincia", "left_semi"
        )
    )
    return out.select("datetime", "cell_id", "provincia", *MOBILITY_METRICS)
