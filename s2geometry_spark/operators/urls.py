"""URL canonicalization and canonical-url dedup.

Web corpora carry the same page under many spellings — scheme/host
case, default ports, fragments, tracking parameters, trailing slashes.
Canonicalization is the cheapest dedup lever there is (a pure
projection, no shuffle) and the standard first pass before any
content-level dedup.

The rule set here is deliberately small, total (any string in, one
string out), and portable primitive-for-primitive to DuckDB so the
gates compare bit-for-bit:

1. drop the fragment (everything from the first '#');
2. split off the query (everything from the first '?');
3. lowercase the scheme://host[:port] head (the part up to the 3rd
   '/'), and drop an explicit default port (:80 / :443);
4. strip ALL trailing '/' from the path (so '/a//' == '/a/' == '/a'
   and a bare '/' collapses to the empty path — idempotent);
5. drop tracking parameters (TRACKING_PREFIXES — one list feeds both
   engine twins), keeping the survivors in their original order.

String-function parity notes: starts/ends-with instead of regexes
for the prefix rules (Java vs RE2 dialects would drift); the single
regex used ('/+$') has no classes or anchors that differ between
dialects; substring_index(u, sep, n) == DuckDB
array_to_string(string_split(u, sep)[1:n], sep), instr == instr.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=", "ref=")


def _tracking_sql() -> str:
    """The DuckDB side of the tracking-param filter, generated from
    TRACKING_PREFIXES so both engines share ONE rule list (a prefix
    added to the tuple reaches both twins — review finding: three
    hardcoded copies drifted silently)."""
    return "".join(f" AND NOT starts_with(p, '{pre}')"
                   for pre in TRACKING_PREFIXES)


def canonical_url(url: Column) -> Column:
    nofrag = F.substring_index(url, "#", 1)
    qpos = F.instr(nofrag, "?")
    base = F.substring_index(nofrag, "?", 1)
    # remainder lengths are dynamic (a fixed cap would silently
    # truncate adversarial mega-urls on the Spark side only and break
    # gate parity with the uncapped DuckDB slices — review finding)
    query = F.when(qpos > 0, F.substring(nofrag, qpos + 1,
                                         F.length(nofrag))) \
        .otherwise(F.lit(""))

    head = F.substring_index(base, "/", 3)
    tail = F.substring(base, F.length(head) + 1, F.length(base))
    headl = F.lower(head)
    headl = (F.when(headl.endswith(":443"),
                    F.substring(headl, 1, F.length(headl) - 4))
             .when(headl.endswith(":80"),
                   F.substring(headl, 1, F.length(headl) - 3))
             .otherwise(headl))
    # ALL trailing slashes: stripping exactly one would make '/x//'
    # and '/x/' land in different canonical forms and the function
    # non-idempotent (review finding). '/+$' has identical semantics
    # in Java regex and RE2 (no classes, no dialect drift).
    tail = F.regexp_replace(tail, "/+$", "")

    def _keep(p):
        cond = p != F.lit("")
        for pre in TRACKING_PREFIXES:
            cond = cond & ~p.startswith(pre)
        return cond

    keep = F.filter(F.split(query, "&", -1), _keep)
    q2 = F.array_join(keep, "&")
    return F.concat(headl, tail,
                    F.when(q2 == "", F.lit(""))
                    .otherwise(F.concat(F.lit("?"), q2)))


def canonical_url_ctes(rel: str, url_col: str = "url") -> str:
    """DuckDB twin of canonical_url as a CTE-stage chain (each Spark
    step is one stage, SURVEY §5.3 discipline). `rel` must provide
    `url_col`; the final stage `cuf` carries every `rel` column plus
    `curl`. Splice as: 'WITH ' + canonical_url_ctes('(...)') + query.
    """
    return f"""cu0 AS (
        SELECT *, string_split({url_col}, '#')[1] AS nf FROM {rel}),
    cu1 AS (SELECT *, instr(nf, '?') AS qp FROM cu0),
    cu2 AS (SELECT *,
        CASE WHEN qp > 0 THEN nf[1:qp-1] ELSE nf END AS base,
        CASE WHEN qp > 0 THEN nf[qp+1:] ELSE '' END AS query
      FROM cu1),
    cu3 AS (SELECT *,
        array_to_string(string_split(base, '/')[1:3], '/') AS head
      FROM cu2),
    cu4 AS (SELECT *, base[length(head)+1:] AS tail,
                   lower(head) AS headl0 FROM cu3),
    cu5 AS (SELECT *,
        CASE WHEN ends_with(headl0, ':443') THEN headl0[1:length(headl0)-4]
             WHEN ends_with(headl0, ':80') THEN headl0[1:length(headl0)-3]
             ELSE headl0 END AS headl,
        regexp_replace(tail, '/+$', '') AS tail2,
        COALESCE(array_to_string(list_filter(string_split(query, '&'),
            p -> p <> ''{_tracking_sql()}), '&'), '') AS q2
      FROM cu4),
    cuf AS (SELECT *, headl || tail2 ||
                   (CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END) AS curl
            FROM cu5)"""


def url_normalize(pages: DataFrame, id_col: str = "url") -> DataFrame:
    """(url, curl): the canonicalization itself — a zero-shuffle
    whole-stage-codegen projection at any scale."""
    return pages.select(F.col(id_col),
                        canonical_url(F.col(id_col)).alias("curl"))


def url_dedup(pages: DataFrame, id_col: str = "url") -> DataFrame:
    """(curl, n_dup, url_keep): group by canonical form, keep the
    lexicographically smallest raw url as canonical representative
    (deterministic, engine-portable — same posture as exact_dedup's
    min(url)). One shuffle of (curl, raw url); the page payload never
    moves — re-join url_keep to fetch surviving rows."""
    return (url_normalize(pages, id_col)
            .groupBy("curl")
            .agg(F.count("*").alias("n_dup"),
                 F.min(id_col).alias("url_keep")))
