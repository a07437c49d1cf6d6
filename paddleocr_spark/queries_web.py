"""Crawl-management queries: the passes that run over the *url/page
inventory* of a Common-Crawl-style corpus before (or instead of)
touching page content — URL canonicalization + variant dedup, recrawl
(latest-snapshot) consolidation, and raw-text byte sanitization.

Same engine-portability contract as `paddleocr_spark.queries`: every
entry is a (spark_fn, oracle_sql) pair, value-exact across engines.
The synthetic `documents` table carries no url/timestamp columns, so
each query derives them as a pure deterministic function of the row —
identical in both engines — exactly like q_url_filter does
(queries_curation.py).

Reference analog: none in PaddleOCR (it starts from decoded images,
tools/infer/predict_system.py main loop); these are the crawl-side
operators the north-star pipeline needs upstream of extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import paddleocr_spark.queries as _queries
from paddleocr_spark.queries import _t


# ---------------------------------------------------------------------------
# URL canonicalization + variant dedup
# ---------------------------------------------------------------------------

# Messy-URL derivation (pure function of the row, same in both engines):
# scheme/host casing, an optional explicit :443 port, an optional
# trailing slash, an optional utm_ tracking param, an optional fragment.
_MESSY_URL_SQL = (
    "concat("
    " case when doc_id % 2 = 0 then 'HTTPS://' else 'https://' end,"
    " case when doc_id % 2 = 0 then concat(upper(source), '.Example.COM')"
    "      else concat(source, '.example.com') end,"
    " case when doc_id % 5 = 0 then ':443' else '' end,"
    " '/', lang, '/', {word0},"
    " case when doc_id % 3 = 0 then '/' else '' end,"
    " case when doc_id % 4 = 0 then concat('?utm_source=feed&id=', cast(doc_id % 7 as string))"
    "      when doc_id % 4 = 1 then concat('?id=', cast(doc_id % 7 as string))"
    "      else '' end,"
    " case when doc_id % 6 = 0 then '#sec' else '' end)"
)

# The same derivation in DuckDB's dialect (|| concat, str_split).
_MESSY_URL_DUCK = """
  (case when doc_id % 2 = 0 then 'HTTPS://' else 'https://' end ||
   case when doc_id % 2 = 0 then upper(source) || '.Example.COM'
        else source || '.example.com' end ||
   case when doc_id % 5 = 0 then ':443' else '' end ||
   '/' || lang || '/' || list_extract(str_split(text, ' '), 1) ||
   case when doc_id % 3 = 0 then '/' else '' end ||
   case when doc_id % 4 = 0 then '?utm_source=feed&id=' || cast(doc_id % 7 as varchar)
        when doc_id % 4 = 1 then '?id=' || cast(doc_id % 7 as varchar)
        else '' end ||
   case when doc_id % 6 = 0 then '#sec' else '' end)
"""

# Canonicalization, identical semantics in both engines (regexp_extract
# returns '' on no-match in Spark AND DuckDB):
#   host: lowercase the authority, drop an explicit port
#   path: drop trailing slashes ('' -> '/')
#   query: drop the fragment, strip utm_* params, keep the rest
_CANON_TMPL = (
    "concat('https://',"
    " lower(regexp_extract({u}, '^[A-Za-z]+://([^/:?#]+)', 1)),"
    " case when regexp_replace(regexp_extract({u}, '^[A-Za-z]+://[^/?#]*(/[^?#]*)', 1), '/+$', '') = ''"
    "      then '/'"
    "      else regexp_replace(regexp_extract({u}, '^[A-Za-z]+://[^/?#]*(/[^?#]*)', 1), '/+$', '') end,"
    " case when regexp_replace(regexp_replace(regexp_extract({u}, '[?]([^#]*)', 1), '(^|&)utm_[^&]*', ''), '^&', '') = ''"
    "      then ''"
    "      else concat('?', regexp_replace(regexp_replace(regexp_extract({u}, '[?]([^#]*)', 1), '(^|&)utm_[^&]*', ''), '^&', '')) end"
    ")"
)


def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + variant rollup (the crawl-frontier dedup
    every web pipeline runs before fetching or re-extracting): lower
    the scheme/host, drop explicit default ports, trailing slashes,
    fragments, and utm_* tracking params; then group the raw variants
    under their canonical form.

    Scale shape: one projection (whole-stage codegen regex work, no
    Python) + one groupBy on the canonical url — the same key the
    pages table is bucketed on, so at corpus scale the aggregation is
    shuffle-free on a bucketed layout. Counts are map-side partial.
    """
    d = _t(spark, sf_dir, "documents")
    messy = _MESSY_URL_SQL.format(word0="element_at(split(text, ' '), 1)")
    rows = d.select(
        F.col("doc_id"),
        F.expr(messy).alias("raw_url"),
    ).select(
        "doc_id", "raw_url",
        F.expr(_CANON_TMPL.format(u="raw_url")).alias("canonical_url"),
    )
    return rows.groupBy("canonical_url").agg(
        F.min("doc_id").alias("rep_doc_id"),
        F.count("*").alias("n_docs"),
        F.countDistinct("raw_url").alias("n_raw_variants"),
    )


SQL_URL_CANONICAL = f"""
with rows as (
  select doc_id, {_MESSY_URL_DUCK} raw_url from documents
), canon as (
  select doc_id, raw_url,
         'https://' ||
         lower(regexp_extract(raw_url, '^[A-Za-z]+://([^/:?#]+)', 1)) ||
         case when regexp_replace(regexp_extract(raw_url, '^[A-Za-z]+://[^/?#]*(/[^?#]*)', 1), '/+$', '') = ''
              then '/'
              else regexp_replace(regexp_extract(raw_url, '^[A-Za-z]+://[^/?#]*(/[^?#]*)', 1), '/+$', '') end ||
         case when regexp_replace(regexp_replace(regexp_extract(raw_url, '[?]([^#]*)', 1), '(^|&)utm_[^&]*', ''), '^&', '') = ''
              then ''
              else '?' || regexp_replace(regexp_replace(regexp_extract(raw_url, '[?]([^#]*)', 1), '(^|&)utm_[^&]*', ''), '^&', '') end
           canonical_url
  from rows
)
select canonical_url, min(doc_id) rep_doc_id, count(*) n_docs,
       count(distinct raw_url) n_raw_variants
from canon group by 1
"""


# ---------------------------------------------------------------------------
# Recrawl consolidation: latest snapshot per page
# ---------------------------------------------------------------------------

def q_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-capture-per-url consolidation (Common Crawl publishes
    overlapping monthly crawls; training pipelines keep the newest
    capture of each url). page_key stands in for the url-hash and the
    monotone doc_id for warc_ts — both derived deterministically so
    the two engines agree byte-for-byte.

    Scale shape: ONE window over (page_key) — the url-hash — which is
    exactly the pipeline's repartition key (jobs/extract.py), so on
    the real pages table this sort-dedup rides the existing partition
    layout with no extra shuffle; per-url snapshot counts come from
    the same window, not a second aggregation.
    """
    d = _t(spark, sf_dir, "documents")
    rows = d.select(
        (F.col("doc_id") % 211).alias("page_key"),
        "doc_id", "n_chars",
    )
    w = Window.partitionBy("page_key").orderBy(F.col("doc_id").desc())
    wall = Window.partitionBy("page_key")
    return (
        rows.withColumn("rn", F.row_number().over(w))
        .withColumn("n_snapshots", F.count("*").over(wall))
        .withColumn("chars_all", F.sum("n_chars").over(wall).cast("bigint"))
        .filter(F.col("rn") == 1)
        .select(
            "page_key",
            F.col("doc_id").alias("latest_doc"),
            F.col("n_chars").alias("chars_latest"),
            "n_snapshots",
            "chars_all",
        )
    )


SQL_LATEST_SNAPSHOT = """
select page_key, latest_doc, chars_latest, n_snapshots, chars_all
from (
  select doc_id % 211 page_key, doc_id latest_doc, n_chars chars_latest,
         row_number() over (partition by doc_id % 211 order by doc_id desc) rn,
         count(*) over (partition by doc_id % 211) n_snapshots,
         cast(sum(n_chars) over (partition by doc_id % 211) as bigint) chars_all
  from documents
) where rn = 1
"""


# ---------------------------------------------------------------------------
# Raw-text sanitization (control bytes, run-on whitespace)
# ---------------------------------------------------------------------------

def q_sanitize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte sanitization of raw extracted text: strip C0 control
    characters, collapse multi-space runs, trim — the cleanup pass a
    web corpus runs on decoder output before tokenization. Corruption
    is injected deterministically (BEL runs, leading blanks, trailing
    newlines keyed on doc_id) so both engines see identical dirty
    input; `clean_ok` asserts the sanitizer restores the original
    text exactly.

    Scale shape: pure whole-stage-codegen string expressions + one
    map-side-partial aggregation on `source`; text bytes cross no
    shuffle (only per-source counters do).
    """
    d = _t(spark, sf_dir, "documents")
    corrupt = (
        "concat("
        " case when doc_id % 4 = 0 then '  ' else '' end,"
        " text,"
        " case when doc_id % 3 = 0 then repeat(char(7), 1 + cast(doc_id % 2 as int)) else '' end,"
        " case when doc_id % 5 = 0 then concat(char(10), char(10)) else '' end)"
    )
    # NB: the control-char class must NOT go through F.expr — Spark's
    # SQL string literal parser eats the backslash escapes. Column-API
    # regexp_replace hands the pattern to the Java regex engine intact.
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("corrupted"), r"[\x00-\x1f]", ""),
            " {2,}", " ",
        )
    )
    rows = (
        d.select("doc_id", "source", "text", F.expr(corrupt).alias("corrupted"))
        .withColumn("clean", clean)
    )
    return rows.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("corrupted") - F.length("clean")).cast("bigint").alias("bytes_removed"),
        F.sum((F.col("clean") == F.col("text")).cast("int")).cast("bigint").alias("n_clean_ok"),
    )


SQL_SANITIZE_TEXT = r"""
with rows as (
  select doc_id, source, text,
         (case when doc_id % 4 = 0 then '  ' else '' end ||
          text ||
          case when doc_id % 3 = 0 then repeat(chr(7), cast(1 + doc_id % 2 as int)) else '' end ||
          case when doc_id % 5 = 0 then chr(10) || chr(10) else '' end) corrupted
  from documents
), cleaned as (
  select *, trim(regexp_replace(regexp_replace(corrupted, '[\x00-\x1f]', '', 'g'),
                                ' {2,}', ' ', 'g')) clean
  from rows
)
select source, count(*) n_docs,
       cast(sum(length(corrupted) - length(clean)) as bigint) bytes_removed,
       cast(sum(case when clean = text then 1 else 0 end) as bigint) n_clean_ok
from cleaned group by 1
"""


def q_mojibake_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-encoding (mojibake) repair — the ftfy-core fix every web
    corpus needs for pages whose UTF-8 bytes were once decoded as
    Latin-1 ('é' shipped as 'Ã©'). The Spark side performs the REAL
    repair: re-encode the wrongly-decoded string back to its original
    bytes and re-decode them properly —
    ``decode(encode(s, 'ISO-8859-1'), 'UTF-8')`` — entirely JVM-side
    codegen. Repair is GATED on a detector (``rlike 'Ã[£©º]'``): text
    carrying genuine accents must never be round-tripped (a lone real
    'é' would shred into replacement chars), so injection plants both
    kinds — mojibake docs (doc_id % 3 = 0) and genuinely-accented docs
    (doc_id % 7 = 0) the gate must skip. ``n_fix_ok`` asserts every doc
    ends byte-equal to its intended text.

    Scale shape: pure whole-stage-codegen string expressions (CASE
    branches evaluate lazily, so the ANSI-strict decode only ever sees
    gated rows); ONE map-side-partial aggregation on `source` — text
    bytes cross no shuffle. The DuckDB oracle proves the re-decode
    equals the explicit digraph replace chain on the same corpus.
    """
    return mojibake_fix_over(_t(spark, sf_dir, "documents"))


def mojibake_fix_over(d: DataFrame) -> DataFrame:
    intended = (
        "case when doc_id % 3 = 0 then"
        " replace(replace(replace(text, 'value', 'valúe'),"
        " 'table', 'tãble'), 'key', 'kéy')"
        " when doc_id % 7 = 0 then replace(text, 'key', 'kéy')"
        " else text end"
    )
    observed = (
        "case when doc_id % 3 = 0 then"
        " replace(replace(replace(text, 'value', 'valÃºe'),"
        " 'table', 'tÃ£ble'), 'key', 'kÃ©y')"
        " when doc_id % 7 = 0 then replace(text, 'key', 'kéy')"
        " else text end"
    )
    rows = d.select(
        "doc_id",
        "source",
        F.expr(intended).alias("intended"),
        F.expr(observed).alias("observed"),
    ).withColumn("is_moji", F.col("observed").rlike("Ã[£©º]"))
    fixed = rows.withColumn(
        "fixed",
        F.when(
            F.col("is_moji"),
            F.decode(F.encode(F.col("observed"), "ISO-8859-1"), "UTF-8"),
        ).otherwise(F.col("observed")),
    )
    return fixed.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("is_moji").cast("int")).cast("bigint").alias("n_mojibake"),
        F.sum((F.col("fixed") == F.col("intended")).cast("int"))
        .cast("bigint")
        .alias("n_fix_ok"),
        F.sum(F.length("observed") - F.length("fixed"))
        .cast("bigint")
        .alias("chars_shrunk"),
    )


SQL_MOJIBAKE_FIX = """
with rows as (
  select doc_id, source,
    case when doc_id % 3 = 0 then
      replace(replace(replace(text, 'value', 'valúe'), 'table', 'tãble'), 'key', 'kéy')
    when doc_id % 7 = 0 then replace(text, 'key', 'kéy')
    else text end intended,
    case when doc_id % 3 = 0 then
      replace(replace(replace(text, 'value', 'valÃºe'), 'table', 'tÃ£ble'), 'key', 'kÃ©y')
    when doc_id % 7 = 0 then replace(text, 'key', 'kéy')
    else text end observed
  from documents
), fixed as (
  select *, regexp_matches(observed, 'Ã[£©º]') is_moji,
    case when regexp_matches(observed, 'Ã[£©º]') then
      replace(replace(replace(observed, 'Ã©', 'é'), 'Ã£', 'ã'), 'Ãº', 'ú')
    else observed end fixed
  from rows
)
select source, count(*) n_docs,
       cast(sum(case when is_moji then 1 else 0 end) as bigint) n_mojibake,
       cast(sum(case when fixed = intended then 1 else 0 end) as bigint) n_fix_ok,
       cast(sum(length(observed) - length(fixed)) as bigint) chars_shrunk
from fixed group by 1
"""


def q_retention_keep_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-retention policy (keep-last-K): an archive of
    overlapping crawls keeps each page's K newest captures and evicts
    the rest — the storage bound every 10^12-page archive applies
    (latest_snapshot is the K=1 special case; the warehouse's
    expire_snapshots is the snapshot-level twin). Per page: the kept
    capture ids (newest-first), evicted count, and reclaimed chars —
    the accounting a retention run reports before deleting.

    Scale shape: ONE window over the url-hash partition key (page_key)
    — the extraction job's existing layout, so on the real pages table
    the rank and the per-page rollup ride one exchange; only
    (page_key, doc_id, n_chars) enter it, content never shuffles."""
    return retention_keep_k_over(_t(spark, sf_dir, "documents"))


def retention_keep_k_over(d: DataFrame, k: int = 2) -> DataFrame:
    rows = d.select(page_key_col().alias("page_key"), "doc_id", "n_chars")
    w = Window.partitionBy("page_key").orderBy(F.col("doc_id").desc())
    ranked = rows.withColumn("rn", F.row_number().over(w))
    # kept_docs serializes to a comma-joined string (the inverted_index
    # postings convention) — a list-typed column is unsortable in the
    # driver's pandas canonicalizer, so both engines emit varchar
    return ranked.groupBy("page_key").agg(
        F.expr(
            f"array_join(transform(array_sort(collect_list(case when"
            f" rn <= {k} then struct(rn, doc_id) end)),"
            " s -> cast(s.doc_id as string)), ',')"
        ).alias("kept_docs"),
        F.sum((F.col("rn") > k).cast("int")).cast("bigint").alias("n_evicted"),
        F.sum(F.when(F.col("rn") > k, F.col("n_chars")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("chars_reclaimed"),
    )


SQL_RETENTION_KEEP_K = """
with ranked as (
  select doc_id % 211 page_key, doc_id, n_chars,
         row_number() over (partition by doc_id % 211 order by doc_id desc) rn
  from documents
)
select page_key,
       string_agg(cast(doc_id as varchar), ',' order by rn)
         filter (where rn <= 2) kept_docs,
       cast(sum(case when rn > 2 then 1 else 0 end) as bigint) n_evicted,
       cast(sum(case when rn > 2 then n_chars else 0 end) as bigint) chars_reclaimed
from ranked group by 1
"""

_queries.QUERIES["retention_keep_k"] = q_retention_keep_k
_queries.ORACLES["retention_keep_k"] = SQL_RETENTION_KEEP_K


# ---------------------------------------------------------------------------
# Recrawl change detection: diff the two latest captures per page
# ---------------------------------------------------------------------------

# The shared capture model for crawl_diff / revisit_schedule /
# jobs/crawl_plan.py: page_key = doc_id % PAGE_KEY_MOD stands in for
# the url-hash, content is deterministically STABLE for doc_id % 4 < 2.
# ONE definition so the queries and the scheduler can never drift onto
# different corpora.
PAGE_KEY_MOD = 211


def page_key_col() -> F.Column:
    return F.col("doc_id") % PAGE_KEY_MOD


def volatile_col() -> F.Column:
    """A page is volatile when its captures actually change — the
    complement of _captures' STABLE branch (doc_id % 4 < 2). The ONE
    definition crawl_budget demand shares with the capture model."""
    return F.col("doc_id") % 4 >= 2


# DuckDB twin of _captures — interpolated into every oracle that walks
# the capture stream, so the two oracles can't drift either
_SQL_CAPS_CTE = """with caps as (
  select doc_id % 211 page_key, doc_id,
         md5(case when doc_id % 4 < 2
                  then 'STABLE-' || cast(doc_id % 211 as varchar)
                  else text end) h
  from documents
)"""


def _captures(d: DataFrame) -> DataFrame:
    """(page_key, doc_id, h): the hashed capture stream — the ONLY
    columns that may cross the wire; content is hashed scan-side."""
    cap = (
        "case when doc_id % 4 < 2 then"
        f" concat('STABLE-', cast(doc_id % {PAGE_KEY_MOD} as string))"
        " else text end"
    )
    return d.select(
        page_key_col().alias("page_key"),
        "doc_id",
        F.md5(F.expr(cap)).alias("h"),
    )


def q_crawl_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-url change detection between the two latest captures (the
    recrawl-dedup decision: re-extract only pages whose content hash
    moved since the previous crawl; Common Crawl pipelines skip
    unchanged captures the same way the daily job's signature store
    skips already-admitted docs). page_key stands in for the url-hash
    and the monotone doc_id for warc_ts, as in q_latest_snapshot;
    capture content is deterministically STABLE for doc_id % 4 < 2 so
    both engines see the same mix of changed and unchanged pairs
    (consecutive captures differ by 211 ≡ 3 (mod 4), so exactly the
    (older≡1, newer≡0) pairs compare equal — the flag genuinely
    exercises both branches).

    Scale shape: content never crosses the wire — the window sees only
    (page_key, doc_id, 16-byte md5); ONE window over page_key (the
    pipeline's repartition key, jobs/extract.py), rn/lead/lag from the
    same window spec, zero joins. At 10^12 rows this is the cheapest
    possible diff: a sort within the already-bucketed url partition.
    """
    rows = _captures(_t(spark, sf_dir, "documents"))
    w = Window.partitionBy("page_key").orderBy(F.col("doc_id").desc())
    return (
        rows.withColumn("rn", F.row_number().over(w))
        .withColumn("prev_doc", F.lead("doc_id").over(w))
        .withColumn("prev_h", F.lead("h").over(w))
        .filter((F.col("rn") == 1) & F.col("prev_doc").isNotNull())
        .select(
            "page_key",
            F.col("doc_id").alias("latest_doc"),
            "prev_doc",
            (F.col("h") != F.col("prev_h")).cast("int").alias("changed"),
        )
    )


SQL_CRAWL_DIFF = f"""
{_SQL_CAPS_CTE}, w as (
  select page_key, doc_id, h,
         row_number() over win rn,
         lead(doc_id) over win prev_doc,
         lead(h) over win prev_h
  from caps window win as (partition by page_key order by doc_id desc)
)
select page_key, doc_id latest_doc, prev_doc,
       cast(h <> prev_h as int) changed
from w where rn = 1 and prev_doc is not null
"""


# ---------------------------------------------------------------------------
# Revisit scheduling: change-rate estimation over the full capture history
# ---------------------------------------------------------------------------

def q_revisit_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl priority from observed change rates (Cho &
    Garcia-Molina 2003, "Effective page refresh policies for web
    crawlers": revisit frequency proportional to a page's estimated
    change frequency). Where `crawl_diff` inspects only the latest
    pair, this walks EVERY consecutive capture pair per page, counts
    how many changed, and buckets pages hot/warm/cold — the table the
    crawl scheduler reads to allocate tomorrow's fetch budget. Same
    capture derivation as crawl_diff (page_key = url-hash stand-in,
    doc_id = capture order, content deterministically stable for
    doc_id % 4 < 2 so both engines see real mixed histories); bucket
    cuts are integer cross-multiplications (4*changed vs 3*pairs),
    never float ratios, so the engines decide identically.

    Scale shape: one Exchange TOTAL — the window sorts (page_key,
    doc_id, 16-byte md5) within the url-hash partitions and the
    per-page aggregate rides the window's hashpartitioning(page_key)
    exchange-free (partial+final agg on the partition key); content
    never shuffles. At 10^12 captures this is the cheapest possible
    full-history scan, and it shares its one shuffle key with the
    extraction job's layout.
    """
    return revisit_schedule_over(_t(spark, sf_dir, "documents"))


def revisit_schedule_over(d: DataFrame) -> DataFrame:
    rows = _captures(d)
    w = Window.partitionBy("page_key").orderBy(F.col("doc_id").desc())
    pairs = rows.withColumn("prev_h", F.lead("h").over(w))
    agg = pairs.groupBy("page_key").agg(
        F.count(F.lit(1)).alias("n_caps"),
        F.count("prev_h").alias("n_pairs"),
        F.sum(
            (F.col("prev_h").isNotNull() & (F.col("h") != F.col("prev_h")))
            .cast("bigint")
        ).alias("n_changed"),
    )
    return agg.select(
        "page_key",
        "n_caps",
        "n_pairs",
        "n_changed",
        F.when(F.col("n_pairs") == 0, "new")
        .when(4 * F.col("n_changed") >= 3 * F.col("n_pairs"), "hot")
        .when(4 * F.col("n_changed") >= F.col("n_pairs"), "warm")
        .otherwise("cold")
        .alias("bucket"),
    )


SQL_REVISIT_SCHEDULE = f"""
{_SQL_CAPS_CTE}, pairs as (
  select page_key, h,
         lead(h) over (partition by page_key order by doc_id desc) prev_h
  from caps
), agg as (
  select page_key,
         count(*) n_caps,
         count(prev_h) n_pairs,
         cast(sum(cast(prev_h is not null and h <> prev_h as bigint))
              as bigint) n_changed
  from pairs group by 1
)
select page_key, n_caps, n_pairs, n_changed,
       case when n_pairs = 0 then 'new'
            when 4 * n_changed >= 3 * n_pairs then 'hot'
            when 4 * n_changed >= n_pairs then 'warm'
            else 'cold' end bucket
from agg
"""


# ---------------------------------------------------------------------------
# Crawl budget apportionment: largest-remainder quota per host
# ---------------------------------------------------------------------------

def q_crawl_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily fetch-budget allocation across hosts — the scheduler step
    between revisit scoring and the fetcher: a global budget of 100
    fetches is apportioned to hosts proportionally to their demand
    (volatile pages, the doc_id % 4 >= 2 captures `revisit_schedule`
    marks changing), using the largest-remainder method so the integer
    quotas sum EXACTLY to the budget (Hamilton apportionment — the same
    exact-integer discipline as the gopher gate's cross-multiplied
    cuts: floor(budget*demand/total) base seats, one bonus seat to the
    hosts with the largest remainders, ties broken by host name), then
    capped at the host's page count.

    Scale shape: ONE corpus-wide shuffle (the per-host partial+final
    count agg — O(hosts) rows out); everything after is O(hosts): the
    demand total rides a 1-row broadcast, and the remainder ranking is
    a window over the host table (thousands of rows at web scale, not
    documents). The largest-remainder seat assignment never touches a
    document row.
    """
    return crawl_budget_over(_t(spark, sf_dir, "documents"), budget=100)


def crawl_budget_over(d: DataFrame, budget: int = 100) -> DataFrame:
    demand = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(volatile_col().cast("bigint")).alias("demand"),
    )
    tot = demand.agg(F.sum("demand").alias("total"))
    # zero-demand day: apportioning over total=0 is 0 everywhere (no
    # demand -> no budget spent), never a DIVIDE_BY_ZERO — ANSI `div`
    # would otherwise kill the scheduler on a quiet crawl day
    per = demand.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "demand",
        # `div` = exact integer division (no double rounding at scale)
        F.expr(
            f"case when total = 0 then 0"
            f" else ({budget} * demand) div total end"
        ).alias("base"),
        F.expr(
            f"case when total = 0 then 0"
            f" else ({budget} * demand) % total end"
        ).alias("rem"),
        "total",
    )
    w = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    left = per.agg((F.lit(budget) - F.sum("base")).alias("leftover"))
    return (
        per.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(left))
        .select(
            "source",
            "n_docs",
            "demand",
            F.least(
                F.col("base")
                + (
                    (F.col("rk") <= F.col("leftover")) & (F.col("total") > 0)
                ).cast("bigint"),
                F.col("n_docs"),
            ).alias("quota"),
        )
    )


SQL_CRAWL_BUDGET = """
with demand as (
  select source, count(*) n_docs,
         cast(sum(cast(doc_id % 4 >= 2 as bigint)) as bigint) demand
  from documents group by 1
), tot as (select cast(sum(demand) as bigint) total from demand),
per as (
  select source, n_docs, demand,
         cast(case when total = 0 then 0
                   else (100 * demand) // total end as bigint) base,
         cast(case when total = 0 then 0
                   else (100 * demand) % total end as bigint) rem,
         total
  from demand, tot
), ranked as (
  select *, row_number() over (order by rem desc, source asc) rk from per
), left_ as (select cast(100 - sum(base) as bigint) leftover from per)
select source, n_docs, demand,
       cast(least(base + cast(rk <= leftover and total > 0 as bigint),
                  n_docs) as bigint) quota
from ranked, left_
"""


def q_politeness_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-delay politeness caps on top of the budget quotas — the
    rate-limit step RFC 9309 implementations layer onto apportionment:
    each host declares a Crawl-delay (derived deterministically, 1-5 s),
    a 60 s fetch window therefore admits ``window div delay`` requests,
    and the host's planned fetches become ``least(quota, cap)`` with
    the overflow reported as deferred — the carry-over a scheduler
    rolls into the next window. Composes crawl_budget's Hamilton
    quotas unchanged (the politeness pass must never re-apportion;
    deferral is per-host only).

    Scale shape: everything here is a pure projection ON TOP of
    crawl_budget's O(hosts) output — the delay is a function of the
    host string, so no join and NO new exchange beyond the ones
    crawl_budget already pays. Exact integer division (`div`)
    everywhere; try_cast + coalesce keep a digitless host at the
    1 s default instead of an ANSI cast crash."""
    return politeness_cap_over(_t(spark, sf_dir, "documents"))


def crawl_delay_col(host: str = "source") -> F.Column:
    """Per-host RFC 9309 Crawl-delay seconds (1-5, derived): the ONE
    definition shared by politeness_cap and jobs/crawl_plan.py's
    --window-s mode, so the query and the scheduler can't drift.
    try_cast + coalesce keep a digitless host at the 1 s default."""
    return (
        F.lit(1)
        + F.coalesce(
            F.regexp_extract(host, r"(\d+)", 1).try_cast("int"),
            F.lit(0),
        )
        % 5
    )


def politeness_cap_over(
    d: DataFrame, budget: int = 100, window_s: int = 60
) -> DataFrame:
    q = crawl_budget_over(d, budget=budget)
    delay = crawl_delay_col()
    out = q.withColumn("crawl_delay_s", delay).withColumn(
        "rate_cap", F.expr(f"cast({window_s} div crawl_delay_s as bigint)")
    )
    return out.select(
        "source",
        "n_docs",
        "demand",
        "quota",
        "crawl_delay_s",
        "rate_cap",
        F.least("quota", "rate_cap").alias("planned"),
        (F.col("quota") - F.least("quota", "rate_cap")).alias("deferred"),
    )


SQL_POLITENESS_CAP = f"""
with q as ({SQL_CRAWL_BUDGET.strip()}),
delayed as (
  select source, n_docs, demand, quota,
         1 + (coalesce(try_cast(regexp_extract(source, '(\\d+)', 1) as int), 0) % 5)
           crawl_delay_s
  from q
)
select source, n_docs, demand, quota, crawl_delay_s,
       cast(60 // crawl_delay_s as bigint) rate_cap,
       least(quota, cast(60 // crawl_delay_s as bigint)) planned,
       quota - least(quota, cast(60 // crawl_delay_s as bigint)) as deferred
from delayed
"""


# ---------------------------------------------------------------------------
# Frontier expansion: outlink discovery anti-joined against known pages
# ---------------------------------------------------------------------------

def q_frontier_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BFS step of the crawl frontier: extract every page's
    outlinks, drop the ones already in the corpus, and report the NEW
    urls to fetch per host — the discover loop that grows a web crawl
    (the host_link_graph query analyzes the realized graph; this one
    produces tomorrow's fetch list). Each doc emits three
    deterministic outlinks (host rotated by doc_id+k, path from the
    doc's k+1-th word) and the known-page set is (source, /first-word)
    — both pure row functions, identical in each engine, with real
    overlap so the anti-join genuinely removes hits.

    Scale shape: the explode is narrow (3 small structs per doc, the
    text column dropped before any exchange); the known set joins
    left-anti on (host, path) with the STRATEGY LEFT TO CATALYST —
    while the known side fits the broadcast threshold (as at test
    scale) it broadcasts and the links side never shuffles for the
    join at all; at 10^12 pages, where the known set is as big as the
    corpus, stats/AQE flip it to a shuffle anti-join on the shared
    (host, path) key — the resume anti-join discipline of
    plans/job.py. The per-host rollup re-shuffles only O(new urls).
    """
    d = _t(spark, sf_dir, "documents")
    w = F.split("text", " ")
    link = lambda k: F.struct(  # noqa: E731
        F.concat(F.lit("src"), ((F.col("doc_id") + k) % 20).cast("string")).alias(
            "host"
        ),
        # try_element_at: short docs emit NULL-path links, which both
        # engines treat identically (never match a known page)
        F.concat(F.lit("/"), F.try_element_at(w, F.lit(k + 1))).alias("path"),
    )
    links = d.select(
        "doc_id", F.explode(F.array(link(1), link(2), link(3))).alias("l")
    ).select("doc_id", "l.host", "l.path")
    known = d.select(
        F.col("source").alias("host"),
        F.concat(F.lit("/"), F.element_at(w, 1)).alias("path"),
    ).distinct()
    fresh = links.join(known, ["host", "path"], "left_anti")
    return fresh.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("path").alias("n_new_pages"),
        F.min("doc_id").alias("first_discovered_by"),
    )


SQL_FRONTIER_EXPAND = """
with w as (
  select doc_id, source, str_split(text, ' ') ws from documents
), links as (
  select doc_id, 'src' || cast((doc_id + 1) % 20 as varchar) host,
         '/' || ws[2] path from w
  union all
  select doc_id, 'src' || cast((doc_id + 2) % 20 as varchar), '/' || ws[3] from w
  union all
  select doc_id, 'src' || cast((doc_id + 3) % 20 as varchar), '/' || ws[4] from w
), known as (
  select distinct source host, '/' || ws[1] path from w
), fresh as (
  select l.* from links l anti join known k using (host, path)
)
select host, count(*) n_links, count(distinct path) n_new_pages,
       min(doc_id) first_discovered_by
from fresh group by 1
"""


# ---------------------------------------------------------------------------
# Head-field extraction (title / meta description / charset) at scan speed
# ---------------------------------------------------------------------------

def q_sitemap_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion — the other half of crawl discovery (RFC
    sitemaps protocol, sitemaps.org): every 10th page publishes a
    3-entry ``<urlset>``; the query PARSES the XML back out
    (``regexp_extract_all`` over ``<loc>``/``<lastmod>``, zipped
    positionally), resolves each listed url against the known-page
    set, and reports per host how many sitemap entries are already
    crawled vs genuinely new, plus the freshest declared lastmod —
    the inputs a scheduler merges with frontier_expand's outlink
    discoveries. The XML is constructed in-expression from the row
    (hosts/ids/dates all deterministic), so both engines parse
    byte-identical documents and real overlap exercises the join.

    Scale shape: the sitemap stream is O(sitemap entries), narrow
    structs only — page text never enters the plan; the known-page
    resolution is the frontier_expand anti-join discipline (strategy
    left to Catalyst: broadcast while the entry stream fits, shuffle
    equi-join on the url key at 10^12 pages); the rollup re-shuffles
    O(hosts). XML parse is whole-stage codegen regex — no Python.
    """
    from paddleocr_spark.queries_curation import N_HOSTS

    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")

    def entry(j: int) -> F.Column:
        m = k * 7 + j * 13
        return F.concat(
            F.lit("<url><loc>https://h"),
            ((k + j) % N_HOSTS).cast("string"),
            F.lit(".example/d/"),
            m.cast("string"),
            F.lit("</loc><lastmod>2026-01-"),
            F.lpad(((m % 28) + 1).cast("string"), 2, "0"),
            F.lit("</lastmod></url>"),
        )

    sitemaps = d.filter(k % 10 == 0).select(
        F.concat(
            F.lit('<?xml version="1.0"?><urlset>'),
            entry(0),
            entry(1),
            entry(2),
            F.lit("</urlset>"),
        ).alias("xml")
    )
    parsed = sitemaps.select(
        F.explode(
            F.arrays_zip(
                F.regexp_extract_all(
                    F.col("xml"), F.lit(r"<loc>([^<]*)</loc>"), F.lit(1)
                ).alias("loc"),
                F.regexp_extract_all(
                    F.col("xml"), F.lit(r"<lastmod>([^<]*)</lastmod>"), F.lit(1)
                ).alias("lm"),
            )
        ).alias("e")
    ).select(
        F.col("e.loc").alias("url"), F.to_date(F.col("e.lm")).alias("lastmod")
    )
    known = d.select(
        F.concat(
            F.lit("https://h"),
            (k % N_HOSTS).cast("string"),
            F.lit(".example/d/"),
            k.cast("string"),
        ).alias("url"),
        F.lit(1).alias("known"),
    )
    joined = parsed.join(known, "url", "left")
    return joined.groupBy(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host")
    ).agg(
        F.count(F.lit(1)).alias("n_listed"),
        F.sum(F.col("known").isNotNull().cast("int"))
        .cast("bigint")
        .alias("n_known"),
        F.sum(F.col("known").isNull().cast("int"))
        .cast("bigint")
        .alias("n_new"),
        F.max("lastmod").alias("last_mod"),
    )


from paddleocr_spark.queries_curation import N_HOSTS as _N_HOSTS

SQL_SITEMAP_EXTRACT = f"""
with sm as (
  select
    '<?xml version="1.0"?><urlset>' ||
    '<url><loc>https://h' || cast((doc_id + 0) % {_N_HOSTS} as varchar) || '.example/d/' ||
      cast(doc_id * 7 + 0 as varchar) || '</loc><lastmod>2026-01-' ||
      lpad(cast(((doc_id * 7 + 0) % 28) + 1 as varchar), 2, '0') || '</lastmod></url>' ||
    '<url><loc>https://h' || cast((doc_id + 1) % {_N_HOSTS} as varchar) || '.example/d/' ||
      cast(doc_id * 7 + 13 as varchar) || '</loc><lastmod>2026-01-' ||
      lpad(cast(((doc_id * 7 + 13) % 28) + 1 as varchar), 2, '0') || '</lastmod></url>' ||
    '<url><loc>https://h' || cast((doc_id + 2) % {_N_HOSTS} as varchar) || '.example/d/' ||
      cast(doc_id * 7 + 26 as varchar) || '</loc><lastmod>2026-01-' ||
      lpad(cast(((doc_id * 7 + 26) % 28) + 1 as varchar), 2, '0') || '</lastmod></url>' ||
    '</urlset>' sx
  from documents where doc_id % 10 = 0
), parsed as (
  select unnest(regexp_extract_all(sx, '<loc>([^<]*)</loc>', 1)) url,
         unnest(regexp_extract_all(sx, '<lastmod>([^<]*)</lastmod>', 1)) lm
  from sm
), known as (
  select 'https://h' || cast(doc_id % {_N_HOSTS} as varchar) || '.example/d/' ||
         cast(doc_id as varchar) url, 1 known
  from documents
)
select regexp_extract(p.url, 'https://([^/]+)', 1) host,
       count(*) n_listed,
       cast(sum(case when kn.known is not null then 1 else 0 end) as bigint) n_known,
       cast(sum(case when kn.known is null then 1 else 0 end) as bigint) n_new,
       max(cast(lm as date)) last_mod
from parsed p left join known kn on p.url = kn.url
group by 1
"""


def q_page_title_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """<head> field extraction — title, meta description, declared
    charset — the metadata pass every web corpus runs before (and
    independently of) main-content extraction; the title/charset feed
    langid priors and dedup keys. The page's head markup is derived
    deterministically from the row (some pages lack a description,
    charset alternates) so both engines parse identical input; a
    missing field extracts as '' in Spark AND DuckDB (regexp_extract
    no-match contract, same as the canonicalizer above).

    Scale shape: a PURE projection — three whole-stage-codegen regex
    extracts, zero shuffles, zero Python; the scan reads exactly
    (doc_id, text, lang, source). This is the query shape where Spark
    matches a native engine byte-for-byte on throughput: the work is
    memory-bandwidth-bound regex over the scanned batch.
    """
    d = _t(spark, sf_dir, "documents")
    head = (
        "concat('<html><head><title>',"
        " element_at(split(text, ' '), 1), ' - ', source,"
        " '</title>',"
        " case when doc_id % 5 = 0 then ''"
        "      else concat('<meta name=\"description\" content=\"',"
        "                  substring(text, 1, 40), '\">') end,"
        " case when doc_id % 3 = 0 then '<meta charset=\"utf-8\">'"
        "      else '<meta charset=\"iso-8859-1\">' end,"
        " '</head>')"
    )
    rows = d.select("doc_id", F.expr(head).alias("head"))
    return rows.select(
        "doc_id",
        F.regexp_extract("head", r"<title>([^<]*)</title>", 1).alias("title"),
        F.regexp_extract(
            "head", r'name="description" content="([^"]*)"', 1
        ).alias("meta_desc"),
        F.regexp_extract("head", r'charset="([^"]*)"', 1).alias("charset"),
        (
            F.regexp_extract("head", r'name="description" content="([^"]*)"', 1)
            != ""
        ).cast("int").alias("has_desc"),
    )


SQL_PAGE_TITLE_META = """
with rows as (
  select doc_id,
         ('<html><head><title>' ||
          list_extract(str_split(text, ' '), 1) || ' - ' || source ||
          '</title>' ||
          case when doc_id % 5 = 0 then ''
               else '<meta name="description" content="' ||
                    substr(text, 1, 40) || '">' end ||
          case when doc_id % 3 = 0 then '<meta charset="utf-8">'
               else '<meta charset="iso-8859-1">' end ||
          '</head>') head
  from documents
)
select doc_id,
       regexp_extract(head, '<title>([^<]*)</title>', 1) title,
       regexp_extract(head, 'name="description" content="([^"]*)"', 1) meta_desc,
       regexp_extract(head, 'charset="([^"]*)"', 1) charset,
       cast(regexp_extract(head, 'name="description" content="([^"]*)"', 1) <> '' as int) has_desc
from rows
"""


# ---------------------------------------------------------------------------
# robots.txt gating: RFC 9309 longest-match with allow-wins-ties
# ---------------------------------------------------------------------------

def q_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt directive evaluation — the crawl-governance gate every
    web corpus applies before a page may even enter the table: per host,
    the MOST SPECIFIC (longest) matching allow/disallow prefix rule
    decides, allow winning length ties (RFC 9309 §2.2.2, the
    google/robotstxt matching order). Hosts are the corpus sources;
    each host's rule set is derived deterministically (even hosts
    disallow /key, every 3rd /batch, every 4th carves back the
    /key/agg allow exception — the longest-match override case), and
    the doc's path comes from its first two words, so all three rule
    depths genuinely fire in both engines. No-match defaults to allow.

    Scale shape: the rule table is O(hosts) — grouped to one
    array<struct> row per host and BROADCAST; each document evaluates
    filter(rules, startswith) + array_max(transform(...)) entirely
    in-expression (struct ordering = (plen, allow), exactly the RFC
    tie-break) so the per-doc cost is codegen with ZERO per-doc
    shuffle; the only exchange in the plan is the O(hosts) distinct.
    At 10^12 docs this is the same broadcast-gate shape as url_filter /
    decontaminate: the big side never moves.

    Reference analog: the cheap-predicate-first gate discipline of
    db_postprocess.py:136-141, applied at the crawl-admission layer.
    """
    return robots_gate_over(_t(spark, sf_dir, "documents"))


def robots_gate_over(d: DataFrame) -> DataFrame:
    hosts = d.select("source").distinct()
    # try_cast: a digitless host parses to NULL -> every rule condition
    # is NULL -> no rules -> default allow, identically in DuckDB
    # (ANSI cast of '' would crash Spark, try_cast errors DuckDB)
    i = F.regexp_extract("source", r"(\d+)", 1).try_cast("int")
    rule = lambda cond, prefix, allow: F.when(  # noqa: E731
        cond, F.struct(
            F.lit(prefix).alias("prefix"),
            F.lit(allow).alias("allow"),
            F.lit(len(prefix)).alias("plen"),
        )
    )
    rules = hosts.select(
        "source",
        F.array_compact(
            F.array(
                rule(i % 2 == 0, "/key", 0),
                rule(i % 3 == 0, "/batch", 0),
                rule(i % 4 == 0, "/key/agg", 1),
            )
        ).alias("rules"),
    )
    docs = d.select(
        "doc_id",
        "source",
        # try_element_at: a short/garbage doc yields a NULL path (and
        # the default-allow verdict) in BOTH engines instead of an
        # ANSI INVALID_ARRAY_INDEX crash in Spark only
        F.concat(
            F.lit("/"),
            F.element_at(F.split("text", " "), 1),
            F.lit("/"),
            F.try_element_at(F.split("text", " "), F.lit(2)),
        ).alias("path"),
    )
    best = (
        "array_max(transform("
        " filter(rules, r -> startswith(path, r.prefix)),"
        " r -> struct(r.plen as plen, r.allow as allow)))"
    )
    return (
        docs.join(F.broadcast(rules), "source", "left")
        .withColumn("best", F.expr(best))
        .select(
            "doc_id",
            "source",
            "path",
            F.coalesce(F.col("best.allow"), F.lit(1)).alias("allowed"),
            F.coalesce(F.col("best.plen"), F.lit(0)).alias("matched_len"),
        )
    )


SQL_ROBOTS_GATE = """
with hosts as (select distinct source from documents),
rules as (
  select source, '/key' prefix, 0 allow, 4 plen from hosts
  where try_cast(regexp_extract(source, '(\\d+)', 1) as int) % 2 = 0
  union all
  select source, '/batch', 0, 6 from hosts
  where try_cast(regexp_extract(source, '(\\d+)', 1) as int) % 3 = 0
  union all
  select source, '/key/agg', 1, 8 from hosts
  where try_cast(regexp_extract(source, '(\\d+)', 1) as int) % 4 = 0
),
docs as (
  select doc_id, source,
         '/' || str_split(text, ' ')[1] || '/' || str_split(text, ' ')[2] path
  from documents
),
verdicts as (
  select d.doc_id, r.allow, r.plen,
         row_number() over (partition by d.doc_id
                            order by r.plen desc, r.allow desc) rn
  from docs d join rules r
    on r.source = d.source and starts_with(d.path, r.prefix)
)
select d.doc_id, d.source, d.path,
       coalesce(v.allow, 1) allowed,
       coalesce(v.plen, 0) matched_len
from docs d left join (select doc_id, allow, plen from verdicts where rn = 1) v
  using (doc_id)
"""


_queries.QUERIES["url_canonical"] = q_url_canonical
_queries.ORACLES["url_canonical"] = SQL_URL_CANONICAL
_queries.QUERIES["latest_snapshot"] = q_latest_snapshot
_queries.ORACLES["latest_snapshot"] = SQL_LATEST_SNAPSHOT
_queries.QUERIES["sanitize_text"] = q_sanitize_text
_queries.ORACLES["sanitize_text"] = SQL_SANITIZE_TEXT
_queries.QUERIES["mojibake_fix"] = q_mojibake_fix
_queries.ORACLES["mojibake_fix"] = SQL_MOJIBAKE_FIX
_queries.QUERIES["crawl_diff"] = q_crawl_diff
_queries.ORACLES["crawl_diff"] = SQL_CRAWL_DIFF
_queries.QUERIES["page_title_meta"] = q_page_title_meta
_queries.ORACLES["page_title_meta"] = SQL_PAGE_TITLE_META
_queries.QUERIES["robots_gate"] = q_robots_gate
_queries.ORACLES["robots_gate"] = SQL_ROBOTS_GATE
_queries.QUERIES["revisit_schedule"] = q_revisit_schedule
_queries.ORACLES["revisit_schedule"] = SQL_REVISIT_SCHEDULE
_queries.QUERIES["crawl_budget"] = q_crawl_budget
_queries.ORACLES["crawl_budget"] = SQL_CRAWL_BUDGET
_queries.QUERIES["frontier_expand"] = q_frontier_expand
_queries.ORACLES["frontier_expand"] = SQL_FRONTIER_EXPAND
_queries.QUERIES["sitemap_extract"] = q_sitemap_extract
_queries.ORACLES["sitemap_extract"] = SQL_SITEMAP_EXTRACT
_queries.QUERIES["politeness_cap"] = q_politeness_cap
_queries.ORACLES["politeness_cap"] = SQL_POLITENESS_CAP
