"""Structure-branch driver queries: the TableMatch / get_pred_html /
line-confidence / DetMetric / word-segmentation operators realized as
DISTRIBUTED DataFrame plans with DuckDB oracles.

These five operators already run per-document inside the Arrow stage
(core/table.py, core/text.py, metrics.py — each golden/parity tested),
but until now their only correctness evidence was pytest. Each query
here re-expresses the same semantics as the Spark-level plan documented
in SURVEY.md §2.3/§2.4 (broadcast join + min-by for the nearest-cell
match, ordered aggregation for the HTML assembly, a bounded per-doc
window for CTC selection and run segmentation), over boxes/tokens
derived as pure deterministic functions of the synthetic tables — the
same engine-portability contract as every other registry entry.

Reference parity targets:
- match_result nearest-cell join: ppstructure/table/matcher.py:77-101
  ((1-IoU, L1-corner distance) argmin, first-cell tie-break).
- get_pred_html ordered interleave: ppstructure/table/matcher.py:103-146
  (the multi-match space-join path; the <b>/empty-member branches are
  unreachable here by construction and stay covered by
  tests/test_core_fixtures.py goldens).
- mean line confidence: ppocr/postprocess/rec_postprocess.py:145-190
  (CTC selection = drop adjacent repeats then blanks; conf = mean over
  selected positions).
- DetMetric hit counting at IoU>0.5: ppocr/metrics/det_metric.py /
  eval_det_iou.py (clamped-intersection IoU — iou_of/area_of,
  picodet_postprocess.py:51-96).
- get_word_info run segmentation: rec_postprocess.py:70-134 (runs of
  one char class; the '.'/'-' joining refinements stay in
  core/text.py:get_word_info, golden-tested).

Scale shape (10^12 rows): the cell side of the match is a 12-row
broadcast (crossJoin with a literal-size frame, no shuffle on the big
side); the argmin is a partial-aggregable min(struct) — map-side
combine, one exchange on the group key. HTML assembly and the two
window queries partition by document — bounded per-partition state,
one exchange each. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import paddleocr_spark.queries as _queries
from paddleocr_spark.queries import _t


# ---------------------------------------------------------------------------
# Synthetic table geometry: a 3x4 cell grid shared by all tables; OCR
# boxes are the true cell jittered by +-2px — pure functions of
# p_partkey, identical in both engines.
# ---------------------------------------------------------------------------

def _ocr_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "part").selectExpr(
        "cast(p_partkey % 8 as int) as table_id",
        "cast(p_partkey as int) as ocr_id",
        "p_name as txt",
        "cast(((p_partkey div 8) % 12) % 4 as int) * 100 + cast(p_partkey % 5 - 2 as int) as ox0",
        "cast(((p_partkey div 8) % 12) div 4 as int) * 30 + cast((p_partkey div 5) % 5 - 2 as int) as oy0",
        "cast(((p_partkey div 8) % 12) % 4 as int) * 100 + 90 + cast((p_partkey div 25) % 5 - 2 as int) as ox1",
        "cast(((p_partkey div 8) % 12) div 4 as int) * 30 + 25 + cast((p_partkey div 125) % 5 - 2 as int) as oy1",
    )


def _cell_grid(spark: SparkSession) -> DataFrame:
    return spark.range(12).selectExpr(
        "cast(id as int) as cell_id",
        "cast((id % 4) * 100 as int) as cx0",
        "cast((id div 4) * 30 as int) as cy0",
        "cast((id % 4) * 100 + 90 as int) as cx1",
        "cast((id div 4) * 30 + 25 as int) as cy1",
    )


# matcher.py:19-25 distance: L1 over corners + min(corner0, corner1).
_DIST_SQL = (
    "abs(cx0-ox0)+abs(cy0-oy0)+abs(cx1-ox1)+abs(cy1-oy1)"
    " + least(abs(cx0-ox0)+abs(cy0-oy0), abs(cx1-ox1)+abs(cy1-oy1))"
)

# matcher.py:28-54 compute_iou on (y0,x0,y1,x1) rects, including the
# >=-edge no-intersection rule; omi = 1 - IoU so min() is argbest.
_OMI_SQL = (
    "cast(1 as double) - (case"
    " when greatest(ox0,cx0) >= least(ox1,cx1)"
    "   or greatest(oy0,cy0) >= least(oy1,cy1) then cast(0 as double)"
    " else cast((least(ox1,cx1)-greatest(ox0,cx0))"
    "        * (least(oy1,cy1)-greatest(oy0,cy0)) as double)"
    "      / ((oy1-oy0)*(ox1-ox0) + (cy1-cy0)*(cx1-cx0)"
    "         - (least(ox1,cx1)-greatest(ox0,cx0))"
    "           * (least(oy1,cy1)-greatest(oy0,cy0))) end)"
)


def _matched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(table_id, ocr_id, txt, cell_id): each OCR box's argmin cell by
    (1-IoU, dist, cell_id) — the last key reproduces match_result's
    stable first-cell tie-break. min(struct(...)) is partial-aggregable
    (map-side combine), so the only exchange is on the group key."""
    j = _ocr_boxes(spark, sf_dir).crossJoin(F.broadcast(_cell_grid(spark)))
    j = j.withColumn("dist", F.expr(_DIST_SQL)).withColumn("omi", F.expr(_OMI_SQL))
    return (
        j.groupBy("table_id", "ocr_id", "txt")
        .agg(F.min(F.struct("omi", "dist", "cell_id")).alias("m"))
        .select("table_id", "ocr_id", "txt", F.col("m.cell_id").alias("cell_id"))
    )


# Shared derivation in DuckDB's dialect.
# dist/omi interpolate the SAME dialect-portable expressions the Spark
# side uses (_DIST_SQL/_OMI_SQL) — one source of truth for the scoring
_MATCH_DUCK = f"""
ocr as (
  select cast(p_partkey % 8 as int) table_id,
         cast(p_partkey as int) ocr_id,
         p_name txt,
         cast(((p_partkey // 8) % 12) % 4 as int) * 100 + cast(p_partkey % 5 - 2 as int) ox0,
         cast(((p_partkey // 8) % 12) // 4 as int) * 30 + cast((p_partkey // 5) % 5 - 2 as int) oy0,
         cast(((p_partkey // 8) % 12) % 4 as int) * 100 + 90 + cast((p_partkey // 25) % 5 - 2 as int) ox1,
         cast(((p_partkey // 8) % 12) // 4 as int) * 30 + 25 + cast((p_partkey // 125) % 5 - 2 as int) oy1
  from part
),
cells as (
  select cast(i as int) cell_id,
         cast((i % 4) * 100 as int) cx0, cast((i // 4) * 30 as int) cy0,
         cast((i % 4) * 100 + 90 as int) cx1, cast((i // 4) * 30 + 25 as int) cy1
  from (select unnest(range(12)) i)
),
scored as (
  select table_id, ocr_id, txt, cell_id,
    {_DIST_SQL} dist,
    {_OMI_SQL} omi
  from ocr, cells
),
matched as (
  select table_id, ocr_id, txt, cell_id
  from (select *, row_number() over (
          partition by table_id, ocr_id order by omi, dist, cell_id) rn
        from scored)
  where rn = 1
)
"""


def q_table_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableMatch nearest-cell similarity join (matcher.py:77-101) as
    the SURVEY §2.3 distributed plan: broadcast cell grid, crossJoin,
    (1-IoU, L1 dist) argmin via partial-aggregable min(struct)."""
    return _matched(spark, sf_dir).select("table_id", "ocr_id", "cell_id")


SQL_TABLE_MATCH = f"""
with {_MATCH_DUCK}
select table_id, ocr_id, cell_id from matched
"""


def q_table_match_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_filter_ocr_result above-table drop (matcher.py:193-203) composed
    with the match: every 17th OCR box is shifted fully above the cell
    grid and must be dropped by the ``oy1 > min(cell y0)`` predicate
    before matching — the reference's rule that text above the table's
    top edge never claims a cell. The table-top bound arrives as a
    1-row broadcast (no driver action); the rest is the same
    partial-aggregable argmin as table_match."""
    noisy = _ocr_boxes(spark, sf_dir).selectExpr(
        "table_id", "ocr_id", "txt", "ox0", "ox1",
        "case when ocr_id % 17 = 0 then oy0 - 100 else oy0 end as oy0",
        "case when ocr_id % 17 = 0 then oy1 - 100 else oy1 end as oy1",
    )
    ymin = _cell_grid(spark).agg(F.min("cy0").alias("ymin"))
    kept = noisy.crossJoin(F.broadcast(ymin)).where("oy1 > ymin").drop("ymin")
    j = kept.crossJoin(F.broadcast(_cell_grid(spark)))
    j = j.withColumn("dist", F.expr(_DIST_SQL)).withColumn("omi", F.expr(_OMI_SQL))
    return (
        j.groupBy("table_id", "ocr_id")
        .agg(F.min(F.struct("omi", "dist", "cell_id")).alias("m"))
        .select("table_id", "ocr_id", F.col("m.cell_id").alias("cell_id"))
    )


SQL_TABLE_MATCH_FILTERED = f"""
with {_MATCH_DUCK},
noisy as (
  select table_id, ocr_id, txt, ox0, ox1,
         case when ocr_id % 17 = 0 then oy0 - 100 else oy0 end oy0,
         case when ocr_id % 17 = 0 then oy1 - 100 else oy1 end oy1
  from ocr
),
kept as (
  select n.* from noisy n, (select min(cy0) ymin from cells) y
  where n.oy1 > y.ymin
),
fscored as (
  select table_id, ocr_id, cell_id,
    {_DIST_SQL} dist,
    {_OMI_SQL} omi
  from kept, cells
)
select table_id, ocr_id, cell_id
from (select *, row_number() over (
        partition by table_id, ocr_id order by omi, dist, cell_id) rn
      from fscored)
where rn = 1
"""


def q_table_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_pred_html ordered interleave (matcher.py:103-146): matched
    cell members space-joined in OCR order (the multi-match rule —
    members here are nonempty, space-free-edged, '<b>'-free, so the
    space-join IS the reference's member loop), empty cells render
    '<td></td>', cells concatenated in structure-token order. Ordered
    aggregation = sort_array(collect_list(struct)) — no window, one
    exchange per groupBy."""
    m = _matched(spark, sf_dir)
    content = m.groupBy("table_id", "cell_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(ocr_id, txt))),"
            " x -> x.txt), ' ') as content"
        )
    )
    frame = (
        _ocr_boxes(spark, sf_dir)
        .select("table_id")
        .distinct()
        .crossJoin(F.broadcast(_cell_grid(spark).select("cell_id")))
    )
    cells = frame.join(content, ["table_id", "cell_id"], "left").withColumn(
        "cell_html", F.expr("concat('<td>', coalesce(content, ''), '</td>')")
    )
    return cells.groupBy("table_id").agg(
        F.expr(
            "concat('<table>', array_join(transform(array_sort("
            "collect_list(struct(cell_id, cell_html))), x -> x.cell_html), ''),"
            " '</table>') as html"
        )
    )


SQL_TABLE_HTML = f"""
with {_MATCH_DUCK},
filled as (
  select table_id, cell_id, string_agg(txt, ' ' order by ocr_id) ctext
  from matched group by table_id, cell_id
),
frame as (
  select distinct o.table_id, c.cell_id
  from (select distinct table_id from ocr) o, cells c
),
cell_html as (
  select f.table_id, f.cell_id,
         '<td>' || coalesce(ctext, '') || '</td>' h
  from frame f left join filled using (table_id, cell_id)
)
select table_id,
       '<table>' || string_agg(h, '' order by cell_id) || '</table>' html
from cell_html group by table_id
"""


def q_line_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean confidence per decoded line (rec_postprocess.py:145-190 —
    the conf arm of CTC greedy decode): select tokens that differ from
    their predecessor (adjacent-repeat drop) and are non-blank (''),
    then mean a deterministic per-token confidence over the selection.
    Confidences accumulate as exact integer milli-units and the mean is
    emitted in floor-divided 1e-4 units, so the result is bit-identical
    across engines and partitionings (double round() half-way rules
    differ); one bounded per-doc window, one exchange."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    sel = tok.withColumn("prev", F.lag("tok").over(w)).where(
        "(prev is null or tok <> prev) and tok <> ''"
    )
    return (
        sel.withColumn("cmilli", F.expr("(length(tok) * 37 + 11) % 100"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sel"),
            F.sum(F.length("tok")).alias("text_len"),
            # mean in exact 1e-4 units (floor): engine-deterministic,
            # unlike round(double) whose half-way rule differs.
            F.expr("(sum(cmilli) * 100) div count(*) as mean_conf_e4"),
        )
    )


SQL_LINE_CONFIDENCE = """
with lst as (
  select doc_id, str_split(text, ' ') w from documents
),
tok as (
  select doc_id, i pos, w[i + 1] tok
  from lst, unnest(range(len(w))) t(i)
),
sel as (
  select doc_id, tok,
         lag(tok) over (partition by doc_id order by pos) prev
  from tok
)
select doc_id,
       cast(count(*) as bigint) n_sel,
       cast(sum(length(tok)) as bigint) text_len,
       cast((sum((length(tok) * 37 + 11) % 100) * 100) // count(*) as bigint) mean_conf_e4
from sel
where (prev is null or tok <> prev) and tok <> ''
group by doc_id
"""


def q_det_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DetMetric hit counting (ppocr/metrics/det_metric.py with the
    clamped iou_of/area_of IoU, picodet_postprocess.py:51-96): each
    event carries a ground-truth box and a jittered prediction; a hit
    is IoU > 0.5; per event_type report n / hits / precision. Pure
    scan + codegen arithmetic + one partial-aggregable groupBy."""
    e = _t(spark, sf_dir, "events").selectExpr(
        "event_type",
        "cast(event_id % 10 as int) * 25 as gx0",
        "cast((event_id div 10) % 10 as int) * 25 as gy0",
        "cast(event_id % 10 as int) * 25 + 20 as gx1",
        "cast((event_id div 10) % 10 as int) * 25 + 20 as gy1",
        "cast(event_id % 13 as int) - 6 as j0",
        "cast((event_id div 13) % 13 as int) - 6 as j1",
        "cast((event_id div 169) % 13 as int) - 6 as j2",
        "cast((event_id div 2197) % 13 as int) - 6 as j3",
    ).selectExpr(
        "event_type", "gx0", "gy0", "gx1", "gy1",
        "gx0 + j0 as px0", "gy0 + j1 as py0",
        "gx1 + j2 as px1", "gy1 + j3 as py1",
    )
    iou = (
        "cast(greatest(least(gx1,px1) - greatest(gx0,px0), 0)"
        " * greatest(least(gy1,py1) - greatest(gy0,py0), 0) as double)"
        " / ((gx1-gx0)*(gy1-gy0) + (px1-px0)*(py1-py0)"
        "    - greatest(least(gx1,px1) - greatest(gx0,px0), 0)"
        "      * greatest(least(gy1,py1) - greatest(gy0,py0), 0))"
    )
    return (
        e.withColumn("hit", F.expr(f"case when {iou} > 0.5 then 1 else 0 end"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("hit").cast("bigint").alias("hits"),
            # precision in exact 1e-4 units (floor) — see mean_conf_e4.
            F.expr("(sum(hit) * 10000) div count(*) as prec_e4"),
        )
    )


SQL_DET_METRIC = """
with b as (
  select event_type,
         cast(event_id % 10 as int) * 25 gx0,
         cast((event_id // 10) % 10 as int) * 25 gy0,
         cast(event_id % 10 as int) * 25 + 20 gx1,
         cast((event_id // 10) % 10 as int) * 25 + 20 gy1,
         cast(event_id % 13 as int) - 6 j0,
         cast((event_id // 13) % 13 as int) - 6 j1,
         cast((event_id // 169) % 13 as int) - 6 j2,
         cast((event_id // 2197) % 13 as int) - 6 j3
  from events
),
p as (
  select event_type, gx0, gy0, gx1, gy1,
         gx0 + j0 px0, gy0 + j1 py0, gx1 + j2 px1, gy1 + j3 py1
  from b
),
h as (
  select event_type,
         case when
           cast(greatest(least(gx1,px1) - greatest(gx0,px0), 0)
                * greatest(least(gy1,py1) - greatest(gy0,py0), 0) as double)
           / ((gx1-gx0)*(gy1-gy0) + (px1-px0)*(py1-py0)
              - greatest(least(gx1,px1) - greatest(gx0,px0), 0)
                * greatest(least(gy1,py1) - greatest(gy0,py0), 0)) > 0.5
         then 1 else 0 end hit
  from p
)
select event_type,
       cast(count(*) as bigint) n,
       cast(sum(hit) as bigint) hits,
       cast((sum(hit) * 10000) // count(*) as bigint) prec_e4
from h group by event_type
"""


def q_word_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_word_info run segmentation (rec_postprocess.py:70-134): chars
    classify into en ([A-Za-z0-9]) / sp (space) / other; words are
    maximal runs of one class. Gaps-and-islands over a bounded per-doc
    window (run_id = running count of class changes); the '.'/'-'
    joining refinements stay in core/text.py:get_word_info (golden-
    tested). Capped at 120 chars/doc so the char explode stays a
    constant per-row factor at any scale."""
    d = _t(spark, sf_dir, "documents")
    ch = d.select(
        "doc_id",
        F.posexplode(
            F.expr("regexp_extract_all(substring(text, 1, 120), '[\\\\s\\\\S]', 0)")
        ).alias("pos", "ch"),
    ).withColumn(
        "cls",
        F.expr(
            "case when ch rlike '^[A-Za-z0-9]$' then 'en'"
            " when ch = ' ' then 'sp' else 'ot' end"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        ch.withColumn(
            "brk",
            F.expr("case when lag(cls) over (partition by doc_id order by pos)"
                   " is distinct from cls then 1 else 0 end"),
        )
        .withColumn("run_id", F.sum("brk").over(w))
        .groupBy("doc_id", "run_id", "cls")
        .agg(F.count("*").alias("run_len"))
    )
    return runs.groupBy("doc_id").agg(
        F.count("*").alias("n_runs"),
        F.sum(F.expr("case when cls = 'en' then 1 else 0 end")).alias("en_runs"),
        F.max(F.expr("case when cls = 'en' then run_len else 0 end")).alias(
            "max_en_run"
        ),
    )


SQL_WORD_RUNS = """
with lst as (
  select doc_id, regexp_extract_all(substr(text, 1, 120), '[\\s\\S]') cs
  from documents
),
ch as (
  select doc_id, i pos, cs[i + 1] ch,
         case when regexp_matches(cs[i + 1], '^[A-Za-z0-9]$') then 'en'
              when cs[i + 1] = ' ' then 'sp' else 'ot' end cls
  from lst, unnest(range(len(cs))) t(i)
),
brk as (
  select doc_id, pos, cls,
         case when lag(cls) over (partition by doc_id order by pos)
                   is distinct from cls then 1 else 0 end b
  from ch
),
runs as (
  select doc_id, cls,
         sum(b) over (partition by doc_id order by pos
                      rows between unbounded preceding and current row) run_id
  from brk
),
agg as (
  select doc_id, run_id, cls, count(*) run_len
  from runs group by doc_id, run_id, cls
)
select doc_id,
       cast(count(*) as bigint) n_runs,
       cast(sum(case when cls = 'en' then 1 else 0 end) as bigint) en_runs,
       cast(max(case when cls = 'en' then run_len else 0 end) as bigint) max_en_run
from agg group by doc_id
"""


_queries.QUERIES["table_match"] = q_table_match
_queries.ORACLES["table_match"] = SQL_TABLE_MATCH
_queries.QUERIES["table_match_filtered"] = q_table_match_filtered
_queries.ORACLES["table_match_filtered"] = SQL_TABLE_MATCH_FILTERED
_queries.QUERIES["table_html"] = q_table_html
_queries.ORACLES["table_html"] = SQL_TABLE_HTML
_queries.QUERIES["line_confidence"] = q_line_confidence
_queries.ORACLES["line_confidence"] = SQL_LINE_CONFIDENCE
_queries.QUERIES["det_metric"] = q_det_metric
_queries.ORACLES["det_metric"] = SQL_DET_METRIC
_queries.QUERIES["word_runs"] = q_word_runs
_queries.ORACLES["word_runs"] = SQL_WORD_RUNS
