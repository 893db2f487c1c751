package graft.transforms

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar/derivation layer (SURVEY.md §2.8, M1),
  * re-expressed as pure Scala functions + codegen-friendly `Column`
  * builders. Semantics cite `/root/reference/lib/transform.js`.
  *
  * Documented deviations (SURVEY.md §7.3):
  *  - owner matching uses case-insensitive substring `contains`, not the
  *    reference's `String.match(userText)` which treats arbitrary field
  *    text as a regex (transform.js:352,367 — injection quirk);
  *  - bounty-span removal removes every occurrence (Java regex
  *    `replaceAll`); the reference removes only the first (single
  *    occurrence in practice — all goldens unaffected).
  */
object TrelloTransforms {

  /** Bounty amount capture, e.g. "Some task (1.0 Dash)" → "1.0".
    * Same pattern as reference transform.js:16 (Java + RE2 compatible). */
  val DashAmountRe: String = "(?i)\\s+\\(\\s*((\\d+)?(\\.\\d+)?)\\s*Dash\\s*\\)\\s*"

  /** Leading index prefix, e.g. "1) do this" (reference transform.js:23). */
  val IndexRe: String = "^\\s*(\\d+\\))\\s+"

  private val dashPattern = java.util.regex.Pattern.compile(DashAmountRe)
  private val indexPattern = java.util.regex.Pattern.compile(IndexRe)

  /** Column form of the bounty extraction: null when absent (the
    * reference leaves `_amount` unset when the regex misses). */
  def dashAmount(name: Column): Column = {
    val ex = regexp_extract(name, DashAmountRe, 1)
    when(ex === "", lit(null)).otherwise(ex)
  }

  /** Strip the first matched bounty span (transform.js:37) + trim. */
  def stripDashAmount(name: String): String = {
    val m = dashPattern.matcher(name)
    if (m.find()) (name.substring(0, m.start()) + name.substring(m.end())).trim
    else name
  }

  /** Strip a leading "N) " index prefix (transform.js:26-30) + trim. */
  def stripIndexPrefix(name: String): String = {
    val m = indexPattern.matcher(name)
    if (m.find()) name.substring(m.end()).trim else name
  }

  /** The 50-char word-budget title/desc fold (transform.js:43-59).
    * Words = split on single whitespace chars, keeping empties (JS
    * `split(/\s/)` semantics). A word is appended to the title while
    * the title is still under 50 chars; the first overflow word flips
    * the rest to the description and suffixes the title with "...". */
  def splitTitleDesc(name: String): (String, String) = {
    val words = name.split("\\s", -1)
    var title = new StringBuilder
    var desc = new StringBuilder
    var inDesc = false
    words.foreach { w =>
      if (inDesc) desc.append(w).append(' ')
      else if (title.length < 50) title.append(w).append(' ')
      else {
        inDesc = true
        val t = title.result().trim + "..."
        title = new StringBuilder(t)
        desc.append(w).append(' ')
      }
    }
    (title.result().trim, desc.result().trim)
  }

  /** Full checklist-item parse (transform.js:25-69): strip index prefix,
    * extract + strip bounty, split title/desc, re-append bounty to desc. */
  def parseChecklistItem(rawName: String): ParsedItem = {
    val afterIndex = stripIndexPrefix(rawName)
    val m = dashPattern.matcher(afterIndex)
    val (amount, cleaned) =
      if (m.find() && m.group(1).nonEmpty)
        (Some(m.group(1)), (afterIndex.substring(0, m.start()) + afterIndex.substring(m.end())).trim)
      else (None, afterIndex)
    val (title, desc0) = splitTitleDesc(cleaned)
    val desc = amount match {
      case Some(a) if desc0.nonEmpty => s"$desc0\n\nBounty: $a Dash"
      case Some(a)                   => s"Bounty: $a Dash"
      case None                      => desc0
    }
    ParsedItem(title, desc, amount)
  }

  /** Checklist name → task type (transform.js:294-295); first-occurrence
    * replace like JS `String.replace(regex)`. */
  def taskType(checklistName: String): String =
    checklistName.replaceFirst("\\s*Tasks?\\s*", "") + " Task"

  /** Card/issue body template (transform.js:75-77). */
  def cardIssueBody(url: Column, desc: Column): Column =
    format_string("Imported from <%s>.\n\n> %s", url, desc)

  /** Checkbox fold (transform.js:179-187). */
  def checkboxLine(state: Column, number: Column): Column =
    format_string("- [%s] #%s",
      when(state === "closed", "x").otherwise(" "), number.cast("string"))

  /** Owner / fallback-owner resolution (transform.js:331-385).
    *
    * @param memberNames    usernames of the card's members, in card order
    * @param rawFallback    secondaryAdmin custom-field text (pre "@"-strip)
    * @param allBoardNames  full board member username dim (exact-match rescue)
    */
  def resolveOwners(
      memberNames: Seq[String],
      rawFallback: Option[String],
      allBoardNames: Seq[String]): (Option[String], Option[String]) = {
    val raw = rawFallback.map(_.stripPrefix("@").toLowerCase).filter(_.nonEmpty)
    val owner = raw match {
      case None    => memberNames.headOption
      case Some(r) => memberNames.find(m => !m.toLowerCase.contains(r))
    }
    val fallback = raw.flatMap { r =>
      memberNames
        .find(m => !owner.exists(_.equalsIgnoreCase(m)) && m.toLowerCase.contains(r))
        .orElse(allBoardNames.find(_.toLowerCase == r))
    }
    if (owner.isDefined && owner == fallback) (owner, None) else (owner, fallback)
  }

  /** Fuzzy username → member lookup (transform.js:189-211): first board
    * member whose username contains the query, case-insensitive. */
  def fuzzyMemberMatch(query: String, usernames: Seq[String]): Option[String] = {
    val q = query.stripPrefix("@").toLowerCase
    if (q.isEmpty) None else usernames.find(_.toLowerCase.contains(q))
  }
}

final case class ParsedItem(title: String, desc: String, amount: Option[String])
