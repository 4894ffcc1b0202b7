package graft.sql

/** Shared DuckDB fragments for the text operators — one definition per
  * concept so the Spark side and every oracle stay in lockstep. */
object TextSql {

  /** Whitespace tokens of lowercased text, empty tokens dropped (matches
    * TextHash.tokenize and the Spark-side filter(split(...)) exactly —
    * trim()-based formulations differ between engines on non-space
    * whitespace and on empty text). */
  val toks = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"

  /** Lowercase alnum-normalized text (matches the Spark norm column). */
  val norm =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** 60-bit md5-derived hash (matches TextHash.hash60). */
  def hexcast(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** Distinct 3-token shingles over a `toks` column; short docs fall back
    * to one whole-doc shingle (matches TextHash.shingles). */
  val shingles: String =
    s"""(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        ELSE list_distinct(list_transform(range(1, len(toks) - 1),
          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) END)"""
      .replaceAll("\\s+", " ")
}
