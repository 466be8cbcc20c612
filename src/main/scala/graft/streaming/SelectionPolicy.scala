package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** Window ("selection") policies — the serializable configs of the
  * reference (reference: pkg/events/selection_policy.go:43-53, factory
  * :272-320; JSON/YAML round-trip :322-348).
  *
  * - SelectNext: one event per firing (counting(1,1)).
  * - CountingWindowPolicy(n, shift): size-n windows sliding by shift;
  *   overlap when shift<n, skip when shift>n.
  * - TemporalWindowPolicy(length, slide): event-time windows; closed when
  *   a later event arrives (Spark: 0-delay watermark — equivalent
  *   data-driven punctuation, SURVEY §2.4).
  */
sealed trait SelectionPolicy

case object SelectNext extends SelectionPolicy

final case class CountingWindowPolicy(n: Int, shift: Int)
  extends SelectionPolicy {
  require(n > 0 && shift > 0)
}

/** Durations are Spark interval strings, e.g. "600 seconds".
  *
  * `allowedLateness` is the one user-facing dial the reference's
  * semantics invite but don't have (SURVEY §2.4): the reference SILENTLY
  * DROPS any event older than the next open window
  * (updateSelectionForBuffer, selection_policy.go:587-589), which this
  * engine matches at the default "0 seconds". A positive lateness holds
  * each window open for that long PAST its data-driven close punctuation
  * — an out-of-order event arriving within the grace period still lands
  * in its window; one arriving beyond it drops exactly as before.
  * Emission latency grows by the same grace (a window cannot fire until
  * punctuation passes end + lateness); state grows by the events of the
  * windows kept open — the standard watermark-delay trade, chosen per
  * subscriber, not globally.
  */
final case class TemporalWindowPolicy(length: String, slide: String,
    allowedLateness: String = "0 seconds")
  extends SelectionPolicy

object TemporalWindowPolicy {
  def tumbling(length: String): TemporalWindowPolicy =
    TemporalWindowPolicy(length, length)
}

object SelectionPolicy {
  /** JSON round-trip (reference: SelectionPolicyConfig,
    * selection_policy.go:322-348). Minimal hand-rolled codec — the config
    * surface is three fixed shapes.
    */
  def toJson(p: SelectionPolicy): String = p match {
    case SelectNext => """{"type":"SelectNext"}"""
    case CountingWindowPolicy(n, shift) =>
      s"""{"type":"CountingWindow","size":$n,"slide":$shift}"""
    case TemporalWindowPolicy(length, slide, lateness) =>
      s"""{"type":"TemporalWindow","length":"$length","slide":"$slide"""" +
        s""","lateness":"$lateness"}"""
  }

  def fromJson(json: String): SelectionPolicy = {
    def str(k: String): Option[String] =
      s""""$k"\\s*:\\s*"([^"]*)"""".r.findFirstMatchIn(json).map(_.group(1))
    def num(k: String): Option[Int] =
      s""""$k"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(json).map(_.group(1).toInt)
    str("type") match {
      case Some("SelectNext") => SelectNext
      case Some("CountingWindow") =>
        CountingWindowPolicy(
          num("size").getOrElse(1), num("slide").getOrElse(1))
      case Some("TemporalWindow") =>
        TemporalWindowPolicy(
          str("length").getOrElse("0 seconds"),
          str("slide").orElse(str("length")).getOrElse("0 seconds"),
          // absent in configs written before the knob existed -> the
          // reference-parity default (drop everything truly late)
          str("lateness").getOrElse("0 seconds"))
      case other =>
        throw new IllegalArgumentException(s"unknown policy type: $other")
    }
  }

  // YAML round-trip (reference: PolicyDescriptionFromYML/ToYML,
  // selection_policy.go:335-348) — transcoded through the JSON codec at
  // the tree level, so both formats share one source of truth.
  private lazy val jsonMapper = new ObjectMapper()
  private lazy val yamlMapper = new ObjectMapper(new YAMLFactory())

  def toYaml(p: SelectionPolicy): String =
    yamlMapper.writeValueAsString(jsonMapper.readTree(toJson(p)))

  def fromYaml(yaml: String): SelectionPolicy =
    fromJson(jsonMapper.writeValueAsString(yamlMapper.readTree(yaml)))
}
