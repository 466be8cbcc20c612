package graft.streaming

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** Declarative query configs — the reference's dormant control plane
  * (reference: StreamConfig/SubscriberConfig/OperatorConfig serialization,
  * pkg/pubsub/config.go:16-31, pkg/processing/config.go:16-27; the
  * commented-out REST API api/api.go:17-88 that would create streams and
  * post JSON events over HTTP).
  *
  * A QueryConfig names a typed source topic and a chain of built-in
  * operators; `build` materializes it through the same QueryBuilder a
  * programmatic user would write. JSON numbers are doubles — matching the
  * reference, where JSON ingestion yields float64
  * (pkg/events/event_test.go:28-32).
  */
final case class StreamConfigDef(topic: String, contentType: String)

final case class OperatorConfigDef(op: String, arg: Option[String])

final case class QueryConfigDef(
    source: StreamConfigDef,
    operators: Seq[OperatorConfigDef],
    policy: Option[SelectionPolicy])

object ControlPlane {

  private val om = new ObjectMapper()

  /** Parse a query description, e.g.
    * {"source":{"topic":"numbers","type":"double"},
    *  "operators":[{"op":"smaller","arg":"50"}],
    *  "policy":{"type":"CountingWindow","size":5,"slide":5}}
    */
  def parse(json: String): QueryConfigDef = {
    val root = om.readTree(json)
    val src = root.get("source")
    require(src != null, "missing source")
    val ops = Option(root.get("operators")).map { arr =>
      (0 until arr.size()).map { i =>
        val o = arr.get(i)
        OperatorConfigDef(o.get("op").asText(),
          Option(o.get("arg")).map(_.asText()))
      }.toSeq
    }.getOrElse(Seq.empty)
    val policy = Option(root.get("policy")).map(p =>
      SelectionPolicy.fromJson(om.writeValueAsString(p)))
    QueryConfigDef(
      StreamConfigDef(src.get("topic").asText(),
        Option(src.get("type")).map(_.asText()).getOrElse("double")),
      ops, policy)
  }

  def toJson(cfg: QueryConfigDef): String = {
    val ops = cfg.operators.map(o =>
      s"""{"op":"${o.op}"${o.arg.map(a => s""","arg":"$a"""").getOrElse("")}}""")
      .mkString("[", ",", "]")
    val pol = cfg.policy.map(p =>
      s""","policy":${SelectionPolicy.toJson(p)}""").getOrElse("")
    s"""{"source":{"topic":"${cfg.source.topic}","type":"${cfg.source.contentType}"},""" +
      s""""operators":$ops$pol}"""
  }

  // YAML forms of the same config (reference: configs carry yaml tags,
  // pkg/pubsub/config.go:16-31, and policies round-trip both formats,
  // selection_policy.go:322-348) — transcoded via the JSON codec.
  private lazy val yom = new ObjectMapper(new YAMLFactory())

  def parseYaml(yaml: String): QueryConfigDef =
    parse(om.writeValueAsString(yom.readTree(yaml)))

  def toYaml(cfg: QueryConfigDef): String =
    yom.writeValueAsString(om.readTree(toJson(cfg)))

  /** Materialize a config into a runnable continuous query. Supported
    * content types: double (JSON-number events) and string; supported
    * operators mirror the reference's built-in catalog.
    */
  def build(ps: PubSub, cfg: QueryConfigDef): ContinuousQuery[_] =
    cfg.source.contentType match {
      case "double" =>
        var b = QueryBuilder[Double](ps).from(cfg.source.topic)
        cfg.operators.foreach { o =>
          val op: TypedOps.Op[Double, Double] = o.op match {
            case "greater" => TypedOps.greater(o.arg.get.toDouble)
            case "smaller" => TypedOps.smaller(o.arg.get.toDouble)
            case "even"    => TypedOps.even[Double]
            case "odd"     => TypedOps.odd[Double]
            case other => throw new IllegalArgumentException(
              s"unknown double operator: $other")
          }
          b = b.connectTo(op)
        }
        b.build()
      case "string" =>
        var b = QueryBuilder[String](ps).from(cfg.source.topic)
        cfg.operators.foreach { o =>
          val op: TypedOps.Op[String, String] = o.op match {
            case "contains" => TypedOps.contains(o.arg.get)
            case "tokenize" => TypedOps.tokenize
            case other => throw new IllegalArgumentException(
              s"unknown string operator: $other")
          }
          b = b.connectTo(op)
        }
        b.build()
      case other =>
        throw new IllegalArgumentException(s"unknown content type: $other")
    }
}
