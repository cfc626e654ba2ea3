package graft.matcher

import graft.core.Json

/** Config-driven feature activation — the reference matcher's primary
  * tuning knob (reference types/ModelTypes.scala:196-198 FeaturesConfig
  * {activeFeatures, activeGroupFeatures, featureExtractorParams},
  * example matcher/src/test/resources/config/features_config.json):
  * a JSON document selects which scalar features and feature families
  * feed the classifier, plus per-extractor parameters (e.g. kNN
  * neighbour count). The default activates everything with the
  * reference hyperparameters, which is byte-identical to the
  * pre-config behavior — the m4/m7/m8 prediction pins hold.
  *
  * Feature names accept both repo-native snake_case column names and
  * the reference's kebab-case spellings ("prop-entries-with-at-sign",
  * "entropy-for-discrete-values", group
  * "prop-instances-per-class-in-knearestneighbours", ...): names are
  * normalized and aliased, unknown names are ignored (the reference
  * leaves name validation as a TODO; here an unknown name simply
  * activates nothing).
  */
final case class FeaturesConfig(
    activeFeatures: Set[String],
    activeGroupFeatures: Set[String],
    featureExtractorParams: Map[String, Map[String, String]]) {

  import FeaturesConfig._

  private def normalizedSingles: Set[String] =
    activeFeatures.map(resolve)
  private def normalizedGroups: Set[String] =
    activeGroupFeatures.map(resolveGroup)

  /** kNN neighbour count for the name-feature extractor (reference
    * param "num-neighbours" on the kNN group). */
  def knnNeighbours: Int =
    featureExtractorParams.collectFirst {
      case (name, ps) if resolveGroup(name) == KnnGroup &&
        ps.contains("num-neighbours") => ps("num-neighbours").toInt
    }.getOrElse(FeatureMatrix.NameK)

  /** Per-class training weights (the reference's COST-MATRIX knob:
    * declared on the Model, types/ModelTypes.scala:58-72, but stubbed
    * — ClassImbalanceResampler.scala:409-411 "not available in Spark
    * MlLib". Modern Spark exposes `weightCol`; a class's weight is the
    * diagonal cost of misclassifying it.) Configured as a
    * `class-weights` extractor-params entry (label -> weight);
    * empty = off, the reference's no-op default. Unparseable weights
    * are ignored, matching the unknown-feature-name posture. */
  def classWeights: Map[String, Double] =
    featureExtractorParams.collectFirst {
      case (name, ps) if FeaturesConfig.normalize(name) == "class_weights" =>
        ps.flatMap { case (label, w) =>
          scala.util.Try(w.toDouble).toOption.map(label -> _) }.toMap
    }.getOrElse(Map.empty)

  /** The active numeric feature columns in canonical assembler order —
    * always a subsequence of [[FeatureMatrix.featureCols]], so two
    * configs with the same active set train identical assemblers. */
  def featureCols: Seq[String] = {
    val active = normalizedSingles ++
      normalizedGroups.flatMap(g => Groups.getOrElse(g, Seq.empty))
    FeatureMatrix.featureCols.filter(active)
  }

  def needsTypeShares: Boolean = normalizedGroups.contains(TypeSharesGroup)
  def needsTypeOneHots: Boolean = normalizedGroups.contains(InferredTypeGroup)
  def needsNameFeatures: Boolean =
    normalizedGroups.contains(KnnGroup) || normalizedGroups.contains(MinDistGroup)

  /** Persisted form: the three config fields plus the RESOLVED feature
    * column list (assembler order) for consumers that only need the
    * final contract. */
  def toJson: String = {
    def arr(xs: Iterable[String]) =
      xs.toSeq.sorted.map(Json.str).mkString("[", ",", "]")
    val params = featureExtractorParams.toSeq.sortBy(_._1).map {
      case (n, ps) =>
        (("name" -> n) +: ps.toSeq.sortBy(_._1)).distinct
          .map { case (k, v) => s"${Json.str(k)}:${Json.str(v)}" }
          .mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    s"""{"activeFeatures":${arr(activeFeatures)},""" +
      s""""activeFeatureGroups":${arr(activeGroupFeatures)},""" +
      s""""featureExtractorParams":$params,""" +
      s""""features":${featureCols.map(Json.str).mkString("[", ",", "]")}}"""
  }
}

object FeaturesConfig {

  /** Canonical group keys (normalized). */
  val LengthStatsGroup = "stats_of_text_length"
  val TypeSharesGroup = "stats_of_numerical_type"
  val InferredTypeGroup = "inferred_data_type"
  val KnnGroup = "prop_instances_per_class_in_knearestneighbours"
  val MinDistGroup = "min_editdistance_from_class_examples"

  /** Group -> member feature columns (canonical assembler names). */
  val Groups: Map[String, Seq[String]] = Map(
    LengthStatsGroup ->
      Seq("mean_len", "median_len", "mode_len", "min_len", "max_len"),
    TypeSharesGroup ->
      Seq("share_int", "share_float", "share_bool", "share_date"),
    InferredTypeGroup -> FeatureMatrix.typeOneHotCols,
    KnnGroup -> Labels.classes.map(c => s"prop_$c"),
    MinDistGroup -> Labels.classes.map(c => s"min_dist_$c"))

  /** Individually activatable scalar features: the profile battery
    * minus the grouped length stats / type shares. */
  val SingleFeatures: Seq[String] =
    FeatureMatrix.profileCols
      .diff(Groups(LengthStatsGroup)).diff(Groups(TypeSharesGroup))

  private def normalize(n: String): String =
    n.trim.toLowerCase.replace('-', '_')

  /** Reference kebab-case spellings -> repo column names (normalized
    * on both sides; identity for repo-native names). */
  private val Alias: Map[String, String] = Map(
    "propmissingvals" -> "prop_missing_vals",
    "ratioalphachars" -> "ratio_alpha_chars",
    "prop_entries_with_at_sign" -> "prop_at_sign",
    "prop_entries_with_currency_symbol" -> "prop_currency",
    "prop_entries_with_hyphen" -> "prop_hyphen",
    "prop_entries_with_paren" -> "prop_paren",
    "mean_commas_per_entry" -> "mean_commas_per_entry",
    "mean_forward_slashes_per_entry" -> "mean_slashes_per_entry",
    "entropy_for_discrete_values" -> "entropy_discrete",
    "shannon_entropy_of_values" -> "shannon_entropy")

  private def resolve(n: String): String = {
    val norm = normalize(n)
    Alias.getOrElse(norm, norm)
  }

  /** Repo-native short group names -> canonical group keys. */
  private val GroupAlias: Map[String, String] = Map(
    "length_stats" -> LengthStatsGroup,
    "type_shares" -> TypeSharesGroup,
    "inferred_type" -> InferredTypeGroup,
    "knn_name" -> KnnGroup,
    "min_dist_name" -> MinDistGroup)

  private def resolveGroup(n: String): String = {
    val norm = normalize(n)
    GroupAlias.getOrElse(norm, norm)
  }

  /** Everything on, reference hyperparameters — the pre-config
    * behavior, bit-for-bit. */
  val Default: FeaturesConfig = FeaturesConfig(
    SingleFeatures.toSet,
    Groups.keySet,
    Map(KnnGroup -> Map("num-neighbours" -> FeatureMatrix.NameK.toString)))

  /** Parse the reference-shaped JSON document. Flat contract: three
    * top-level fields; activeFeatures / activeFeatureGroups are string
    * arrays, featureExtractorParams an array of flat objects with a
    * "name" field (numbers accepted as param values). */
  def fromJson(json: String): FeaturesConfig = {
    def strArray(key: String): Seq[String] =
      ("\"" + key + "\"\\s*:\\s*\\[([^\\]]*)\\]").r
        .findFirstMatchIn(json).toSeq.flatMap(m =>
          "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(m.group(1))
            .map(x => Json.unescape(x.group(1))))
    val params: Map[String, Map[String, String]] =
      "\"featureExtractorParams\"\\s*:\\s*\\[((?s).*?)\\]".r
        .findFirstMatchIn(json).map { arr =>
          "\\{[^{}]*\\}".r.findAllIn(arr.group(1)).map { obj =>
            val kv = "\"([\\w-]+)\"\\s*:\\s*(?:\"((?:[^\"\\\\]|\\\\.)*)\"|(-?[0-9.eE]+))".r
              .findAllMatchIn(obj).map { m =>
                m.group(1) -> Json.unescape(
                  Option(m.group(2)).getOrElse(m.group(3)))
              }.toMap
            kv.getOrElse("name", "") -> (kv - "name")
          }.filter(_._1.nonEmpty).toMap
        }.getOrElse(Map.empty)
    FeaturesConfig(
      strArray("activeFeatures").toSet,
      strArray("activeFeatureGroups").toSet,
      params)
  }
}
