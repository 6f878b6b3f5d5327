package graft.registry

import graft.functions.AgentText
import graft.model.{Invocation, Tool, ValidatedInvocation}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tool registry semantics (SURVEY.md §2.6 U1, §2.3 J1/J2; reference
  * manager.py:216-250, memory.py:207-247).
  *
  * Scale notes: registries are tiny dimensions — every join against
  * them is a broadcast; the last-wins dedup is one narrow window over
  * the registry itself, never over invocation traffic.
  */
object Registry {

  /** U1/Q7 — union tool lists across servers, name collisions resolved
    * last-server-wins (dict-overwrite order = config scan order, which
    * [[Tool.serverOrder]] makes explicit and deterministic). */
  def unionLastWins(tools: Dataset[Tool]): Dataset[Tool] = {
    import tools.sparkSession.implicits._
    val w = Window.partitionBy($"name").orderBy(desc("serverOrder"))
    tools.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
      .as[Tool]
  }

  /** J1 — resolve invocations to their owning server (manager.py:236-248):
    * broadcast inner join on tool name; unmatched invocations drop out
    * exactly like the reference's "Cannot find tool" path. */
  def resolve(invocations: Dataset[Invocation], tools: Dataset[Tool])
      : Dataset[(Invocation, Tool)] = {
    import invocations.sparkSession.implicits._
    invocations.joinWith(broadcast(unionLastWins(tools)),
      invocations("name") === tools("name"), "inner")
  }

  /** J2 — validate + coerce invocation args against the declared JSON
    * schema (memory.py:213-239): unknown keys invalidate; "number"
    * values coerce with Python semantics ("5.0" → 5). Schema lookup is
    * a broadcast map (registries are bounded); arg parsing is per-row. */
  def validateArgs(
      invocations: Dataset[Invocation], tools: Dataset[Tool])
      : Dataset[ValidatedInvocation] = {
    val spark = invocations.sparkSession
    import spark.implicits._
    val schemas: Map[String, Map[String, String]] =
      unionLastWins(tools).collect().map { t =>
        t.name -> parseSchemaTypes(t.inputSchema)
      }.toMap
    val schemasB = spark.sparkContext.broadcast(schemas)
    invocations.map { inv =>
      schemasB.value.get(inv.name) match {
        case None =>
          ValidatedInvocation(inv.id, inv.name, inv.argsJson, valid = false,
            s"Operation ${inv.name} cannot be found.")
        case Some(props) =>
          AgentText.parseJson5ish(inv.argsJson) match {
            case Some(AgentText.JObj(fields)) =>
              val coerced = fields.toSeq.map { case (k, v) =>
                if (!props.contains(k)) Left(s"unknown arg '$k'")
                else {
                  val raw = v match {
                    case AgentText.JStr(s) => s
                    case AgentText.JNum(d) => if (d == math.floor(d) && !d.isInfinite) d.toLong.toString else d.toString
                    case AgentText.JBool(b) => b.toString
                    case nested => AgentText.renderJson(nested) // keep valid JSON
                  }
                  AgentText.coerceArg(raw, props(k)) match {
                    case Some(cv) => Right(k -> cv)
                    case None => Left(s"invalid value for '$k' (${props(k)})")
                  }
                }
              }
              coerced.collectFirst { case Left(e) => e } match {
                case Some(err) =>
                  ValidatedInvocation(inv.id, inv.name, inv.argsJson, valid = false, err)
                case None =>
                  val argsOut = coerced.collect { case Right((k, cv)) =>
                    val vs = cv match {
                      case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
                      case other => other.toString
                    }
                    "\"" + k + "\": " + vs
                  }.mkString("{", ", ", "}")
                  ValidatedInvocation(inv.id, inv.name, argsOut, valid = true, null)
              }
            case _ =>
              ValidatedInvocation(inv.id, inv.name, inv.argsJson, valid = false,
                "args are not a JSON object")
          }
      }
    }
  }

  /** Extract `properties.<name>.type` pairs from a JSON-schema string. */
  private[registry] def parseSchemaTypes(schemaJson: String): Map[String, String] =
    AgentText.parseJson5ish(schemaJson) match {
      case Some(AgentText.JObj(fields)) =>
        fields.get("properties") match {
          case Some(AgentText.JObj(props)) =>
            props.map {
              case (k, AgentText.JObj(pf)) =>
                k -> (pf.get("type") match {
                  case Some(AgentText.JStr(t)) => t
                  case _ => "string"
                })
              case (k, _) => k -> "string"
            }
          case _ => Map.empty
        }
      case _ => Map.empty
    }
}
