package graft.board

import org.apache.spark.sql.DataFrame

/** The reference's two console config-report utilities, re-expressed
  * over the engine's dimension frames (driver-side formatting of
  * inherently tiny config data — the analytic path never goes through
  * these):
  *
  *  - `utils/get-member-info.js:5-12`: each board member rendered as a
  *    ready-to-paste members.json line,
  *    `"<id>": "trello:<username>",` padded to column 30 with the full
  *    name as a trailing comment;
  *  - `utils/get-github-project-fields.js:5-12`: each project field as
  *    a ready-to-paste `"<id>": "<name>"` mapping line.
  */
object Reports {

  private def jsonString(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  /** members (id, username, fullName) → get-member-info lines.
    * `console.info(a, b, c)` joins its arguments with single spaces;
    * the padEnd(30) is applied to `JSON.stringify("trello:" + username)
    * + ","` exactly as in the reference. */
  def memberInfoLines(members: DataFrame): Seq[String] =
    members.select("id", "username", "fullName").collect().toSeq.map { r =>
      val idPart = jsonString(r.getString(0)) + ":"
      val userPart = (jsonString("trello:" + r.getString(1)) + ",").padTo(30, ' ')
      s"$idPart $userPart // ${r.getString(2)}"
    }

  /** fields (id, name) → get-github-project-fields lines. */
  def fieldLines(fields: DataFrame): Seq[String] =
    fields.select("id", "name").collect().toSeq.map { r =>
      s"${jsonString(r.getString(0))}: ${jsonString(r.getString(1))}"
    }
}
