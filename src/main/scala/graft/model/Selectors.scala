package graft.model

import java.util.regex.Pattern

/** Table-matching patterns: comma-separated entries, each entry a dot-separated
  * list of per-part regexes.
  *
  * Mirrors the reference's `Selectors`
  * (flink-cdc-common/src/main/java/org/apache/flink/cdc/common/schema/Selectors.java:30)
  * and its tokenizer `Predicates.RegExSplitterByDot`
  * (common/utils/Predicates.java:164-180): entries split on UNESCAPED dots,
  * then each part un-escapes `\.` to a plain regex `.` — so `db.user_\.*`
  * means part regexes `db` and `user_.*` (any-char dot, NOT a literal dot).
  * Parts compile CASE_INSENSITIVE (Predicates.includes → setOfRegex,
  * Predicates.java:39-41,63-65). A 1-part pattern matches the table name,
  * 2 parts match (schemaName, tableName), 3 parts all three. This is the
  * matcher behind `transform.source-table`, `route.source-table` and source
  * `tables:` options (docs/content/docs/core-concept/transform.md:97-108).
  */
final case class Selectors(patterns: Seq[Seq[Pattern]]) {
  def matches(id: TableId): Boolean = patterns.exists { parts =>
    val target: Seq[String] = parts.length match {
      case 1 => Seq(id.tableName)
      case 2 => Seq(id.schemaName, id.tableName)
      case _ => Seq(id.namespace, id.schemaName, id.tableName)
    }
    parts.length == target.length &&
      parts.zip(target).forall { case (p, s) => p.matcher(s).matches() }
  }
}

object Selectors {
  /** Split on dots that are not escaped as `\.`. */
  private[model] def splitParts(pattern: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '\\' && i + 1 < pattern.length) { cur.append(c).append(pattern.charAt(i + 1)); i += 2 }
      else if (c == '.') { parts += cur.toString; cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    parts += cur.toString
    parts.toSeq
  }

  def parse(spec: String): Selectors = Selectors(
    spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      .map(entry => splitParts(entry).map(p =>
        // un-escape `\.` to regex any-char, like RegExSplitterByDot.split
        Pattern.compile(p.replace("\\.", "."), Pattern.CASE_INSENSITIVE)))
  )
}
