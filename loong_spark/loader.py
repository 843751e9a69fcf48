"""Config-driven ETL loader — the set-oriented rebuild of the reference's
Mongo→MySQL batch loader (§3.4 lifecycle).

The reference walks an INI mapping per target table
(/root/reference/lib/Loong/Loader.pm:39-78; DSL example
conf/site/hupu.com/load.ini): scan the driving collection (S7), optional
regex URL filter (S8, Loader.pm:119-122), per-doc lookup of related
collections keyed by ``object_id`` with a left-biased hash merge
(J1+P12, Loader.pm:88-103 + lib/Loong/Utils.pm:19-30), copy INI
``dst=src`` column pairs skipping the meta keys
``id,index,source,pattern,object_id`` (P13, Loader.pm:66-70), then
row-at-a-time ``insert_or_update`` keyed on ``index`` columns
(J2, lib/Loong/DB/MySQL.pm:42-46).

The rebuild expresses the SAME mapping DSL as one declarative plan per
table: broadcast left joins + coalesce + select/alias + a MERGE-shaped
dedup — Catalyst then gives pushdown/pruning/broadcast for free, and the
per-row Mongo find_one / MySQL roundtrips (the reference's scale
killer) disappear entirely. At 100 TB the driving scan is the only big
input; related sources broadcast when small, shuffle-join on the
object_id key otherwise.

Documented divergence (SURVEY.md §7 non-goals): the reference's
``aggregate_doc`` rebinds the merge target each iteration so with 3+
sources only the LAST related collection survives (Loader.pm:97-101) —
a bug, not replicated: here every related source merges left-biased in
declaration order. Rows lacking a key take the related value via
``coalesce`` (the row-wise analogue of merge_hash's exists-check).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: INI meta keys that are NOT column mappings (Loader.pm:66-70 skip list)
META_KEYS = ("id", "index", "source", "pattern", "object_id")


@dataclass(frozen=True)
class TableMapping:
    """One target table's load config — the [table] INI section."""

    name: str
    #: dst column → src field (the INI ``dst=src`` pairs, P13)
    columns: dict[str, str]
    #: upsert key columns (INI ``index=a,b``, J2)
    index: list[str]
    #: source collections; first drives the scan, rest join (J1)
    source: list[str]
    #: equi-join key columns for related sources (INI ``object_id=``)
    object_id: list[str] = field(default_factory=list)
    #: optional url regex filter on the driving source (S8)
    pattern: str | None = None


def mapping_from_ini_section(name: str, section: dict[str, str]) -> TableMapping:
    """Build a TableMapping from a parsed INI section dict — exactly the
    reference's split of meta keys vs dst=src pairs (Loader.pm:50-70)."""
    return TableMapping(
        name=name,
        columns={k: v for k, v in section.items() if k not in META_KEYS},
        index=[s for s in section.get("index", "").split(",") if s],
        source=[s for s in section.get("source", "").split(",") if s],
        object_id=[s for s in section.get("object_id", "").split(",") if s],
        pattern=section.get("pattern") or None,
    )


def aggregate_docs(dfs: dict[str, DataFrame], m: TableMapping) -> DataFrame:
    """J1+P12: driving source left-joins each related source on
    ``object_id``; overlapping columns merge left-biased
    (coalesce(driving, related) — driving wins where present)."""
    base = dfs[m.source[0]]
    if m.pattern:
        base = base.filter(F.col("url").rlike(m.pattern))  # S8
    for s in m.source[1:]:
        rel = dfs[s]
        overlap = [
            c for c in rel.columns if c in base.columns and c not in m.object_id
        ]
        rel = rel.select(
            *m.object_id,
            *[F.col(c).alias(f"__rel_{c}" if c in overlap else c) for c in rel.columns
              if c not in m.object_id],
        )
        # no pinned broadcast: related sources are arbitrary tables
        # (unbounded at scale) — AQE broadcasts small sides at runtime
        # from MEASURED sizes and keeps big ones as shuffle joins
        base = base.join(rel, m.object_id, "left")
        for c in overlap:
            base = base.withColumn(c, F.coalesce(F.col(c), F.col(f"__rel_{c}"))).drop(
                f"__rel_{c}"
            )
    return base


def load_table(dfs: dict[str, DataFrame], m: TableMapping) -> DataFrame:
    """P13 column map over the aggregated doc: select src→dst renames in
    mapping order, skipping meta keys (already split out)."""
    merged = aggregate_docs(dfs, m)
    return merged.select(*[F.col(src).alias(dst) for dst, src in m.columns.items()])


def upsert(
    target: DataFrame | None,
    batch: DataFrame,
    index: list[str],
    order_by: list[str],
) -> DataFrame:
    """J2 MERGE semantics as a DataFrame op: per ``index`` key the
    newest batch row (max order_by, deterministic) replaces any target
    row; unmatched target rows survive. On Iceberg this is
    ``MERGE INTO t USING s ON <index> WHEN MATCHED UPDATE WHEN NOT
    MATCHED INSERT`` (reference upsert: MySQL.pm:42-46)."""
    w = Window.partitionBy(*index).orderBy(*[F.desc(c) for c in order_by])
    winners = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if target is None:
        return winners
    keep = target.join(winners.select(*index), index, "left_anti")
    return keep.unionByName(winners)


def transfer_tables(
    dfs: dict[str, DataFrame],
    mappings: list[TableMapping],
    targets: dict[str, DataFrame] | None = None,
    order_by: dict[str, list[str]] | None = None,
) -> dict[str, DataFrame]:
    """The transfer_data driver (Loader.pm:39-78): process target tables
    in declaration order, each = scan → aggregate → map → upsert."""
    out: dict[str, DataFrame] = {}
    for m in mappings:
        batch = load_table(dfs, m)
        tgt = (targets or {}).get(m.name)
        ob = (order_by or {}).get(m.name, m.index)
        out[m.name] = upsert(tgt, batch, m.index, ob)
    return out
