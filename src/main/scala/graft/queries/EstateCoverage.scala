package graft.queries

/** The STRUCTURAL tie between the at-rest estate and its governance (the
  * r17 verdict's #2): every [[AtRestTables]] lifecycle key maps either to
  * the q311 estate-ledger classes (or q314 remediation-audit classes)
  * that measure its persisted bytes, or to an explicit exemption with a
  * stated reason. `EstateCoverageSpec` scans `src/main` for the
  * AtRestTables get/getPath registrations (their s-interpolated
  * prefix-pipe key literals) and asserts
  * this map covers them EXACTLY — so a round that adds a 29th at-rest
  * artifact and forgets to classify it reddens `sbt test` instead of
  * silently escaping the erasure census.
  *
  * An [[Audited]] entry names the audit query and the subset of its
  * declared classes ([[TextQueries.EstateLedgerClasses]] /
  * [[TextQueries.RemediatedEstateClasses]]) that measure THIS key's
  * tables; the spec validates the names against those declarations. An
  * [[Exempt]] entry must say WHY no measure is needed — "holds no
  * cohort-keyed personal data" being the only honest shape of reason.
  */
private[graft] object EstateCoverage {

  sealed trait Entry
  /** Covered: `classes` of `query`'s declared inventory measure this
    * key's persisted artifacts. */
  final case class Audited(query: String, classes: Seq[String]) extends Entry
  /** Not measured, with the reason on record. */
  final case class Exempt(reason: String) extends Entry

  val coverage: Map[String, Entry] = Map(
    // --- text/document artifacts -------------------------------------
    "invidx" -> Audited("q311", Seq("postings_mor", "doclen_mor")),
    "erasecmp" -> Audited("q311",
      Seq("postings_compacted", "doclen_compacted")),
    "invpos" -> Audited("q311", Seq("postings_positional")),
    "srcfmt" -> Audited("q311", Seq("docs_jsonl", "docs_csv")),
    "orcfmt" -> Audited("q311", Seq("docs_orc")),
    "docbloom" -> Audited("q311", Seq("docs_bloom_layout")),
    "binfiles" -> Audited("q311", Seq("blob_store")),
    // --- SAX / time-series artifacts ----------------------------------
    "q78" -> Audited("q311", Seq("word_dict_users")),
    // --- vector / multimodal indexes ----------------------------------
    "ivfidx" -> Audited("q311", Seq("ivf_codes_blue", "ivf_cents_blue")),
    "eraseann2" -> Audited("q311",
      Seq("ivf_codes_green", "ivf_cents_green")),
    "ivfincr" -> Audited("q311", Seq("ivf_cents_incr")),
    "mmidx" -> Audited("q311", Seq("mm_codes", "mm_cents")),
    "mmgen" -> Audited("q311",
      Seq("mm_cents_gen", "mm_codes_gen1", "mm_codes_gen2")),
    // --- event layouts / relational state ------------------------------
    "evpart" -> Audited("q311", Seq("events_by_day")),
    "zorder" -> Audited("q311", Seq("events_zorder")),
    "evrange" -> Audited("q311", Seq("events_ranged")),
    "schevo" -> Audited("q311", Seq("events_schema_gens")),
    "upsert" -> Audited("q311", Seq("upsert_state")),
    "aggmv" -> Audited("q311", Seq("agg_mv_groups")),
    "mvsnap" -> Audited("q311",
      Seq("snapshot_v1_groups", "snapshot_v2_groups")),
    "hllmv" -> Audited("q311", Seq("hll_mv_registers")),
    "gdpr" -> Audited("q311", Seq("purge_deletion_vector")),
    // --- erasure-control state (itself lists personal identifiers) ----
    "erasetxt" -> Audited("q311", Seq("erase_tomb_text")),
    "erasepost" -> Audited("q311", Seq("erase_tomb_postings")),
    "eraseann" -> Audited("q311", Seq("erase_tomb_ann")),
    "erasemm" -> Audited("q311", Seq("erase_tomb_mm")),
    // --- remediated outputs (audited by q314/q315, cohort-free by build)
    "eraserem" -> Audited("q314", TextQueries.RemediatedEstateClasses),
    "eraserem2" -> Audited("q315", RelQueries.UserEstateRemediationClasses),
    "eraserem3" -> Audited("q317", TextQueries.DocEstateRemediationClasses),
    // --- exemptions ----------------------------------------------------
    "factbkt" -> Exempt(
      "holds only the TPC-H business relations (orders/lineitem bucketed " +
        "on o_orderkey/l_orderkey); neither erasure cohort key (doc_id, " +
        "events.user_id) appears in their schemas and no erasure cohort " +
        "is defined over them"),
    "erasegenptr" -> Exempt(
      "one control-plane row (active_gen, generation_key) naming which " +
        "index generation serves — carries no cohort-keyed or " +
        "user/doc-derived data at all"))
}
