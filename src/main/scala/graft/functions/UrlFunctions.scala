package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for URL-level dedup — the first dedup pass of a
  * web-scale training-data pipeline (before any content hashing): crawl
  * frontiers emit the same page as protocol/case/tracking-param/fragment
  * variants, and collapsing them is a pure per-row expression, not a
  * shuffle.
  *
  * Rules (the common canonical form):
  *   - scheme and authority lowercase (path/query case-significant),
  *   - default ports stripped (`:80` on http, `:443` on https),
  *   - fragment stripped,
  *   - `utm_*` tracking parameters stripped (with separator repair),
  *   - trailing `/` and dangling `?` stripped.
  *
  * Everything is built-in `regexp_replace`/`regexp_extract` — whole-stage
  * codegen, linear in corpus size, no UDF. The same rules are expressible
  * in DuckDB's RE2 dialect (no lookbehind used), so the `q_url_dedup`
  * oracle replays them independently.
  */
object UrlFunctions {

  def canonicalizeUrl(u: Column): Column = {
    // 1. lowercase scheme://authority, keep the rest untouched
    val authority = lower(regexp_extract(u, "^([^/]*//[^/?#]*)", 1))
    val rest = regexp_replace(u, "^[^/]*//[^/?#]*", "")
    val x0 = concat(authority, rest)
    // 2. default ports — the captured tail anchors the port's END (an
    // unanchored ':80' would eat the prefix of ':8080'); RE2 (the oracle
    // dialect) has no lookahead, so the tail is captured and re-emitted
    val x1 = regexp_replace(x0, "^(https://[^/:?#]*):443($|[/?#].*)", "$1$2")
    val x2 = regexp_replace(x1, "^(http://[^/:?#]*):80($|[/?#].*)", "$1$2")
    // 3. fragment
    val x3 = regexp_replace(x2, "#.*$", "")
    // 4. utm_* params. Order matters because regexp_replace does not
    // rescan replaced text: strip every NON-LEADING '&utm_…' first (so
    // '?utm_a&utm_b&c' collapses to '?utm_a&c' in one pass), THEN the
    // leading '?utm_…&' / '?utm_…$' forms.
    val x4 = regexp_replace(x3, "&utm_[^&#]*", "")
    val x5 = regexp_replace(x4, "\\?utm_[^&#]*&", "?")
    val x6 = regexp_replace(x5, "\\?utm_[^&#]*$", "")
    // 5. trailing slash / dangling '?'
    val x7 = regexp_replace(x6, "/$", "")
    regexp_replace(x7, "\\?$", "")
  }

  /** The DuckDB spelling of [[canonicalizeUrl]] (RE2 `\\1` backrefs and
    * explicit 'g' flags), for oracle SQL construction. */
  def sqlCanonicalizeUrl(e: String): String = {
    val x0 = s"lower(regexp_extract($e, '^([^/]*//[^/?#]*)', 1)) || " +
      s"regexp_replace($e, '^[^/]*//[^/?#]*', '', 'g')"
    val x1 = s"regexp_replace($x0, '^(https://[^/:?#]*):443($$|[/?#].*)', " +
      "'\\1\\2', 'g')"
    val x2 = s"regexp_replace($x1, '^(http://[^/:?#]*):80($$|[/?#].*)', " +
      "'\\1\\2', 'g')"
    val x3 = s"regexp_replace($x2, '#.*$$', '', 'g')"
    val x4 = s"regexp_replace($x3, '&utm_[^&#]*', '', 'g')"
    val x5 = s"regexp_replace($x4, '\\?utm_[^&#]*&', '?', 'g')"
    val x6 = s"regexp_replace($x5, '\\?utm_[^&#]*$$', '', 'g')"
    val x7 = s"regexp_replace($x6, '/$$', '', 'g')"
    s"regexp_replace($x7, '\\?$$', '', 'g')"
  }
}
