package graft

import java.nio.file.{Files, Paths}

/** Dumps the content-canonical sf1-evidence oracle SQL
  * ([[graft.operators.Dedup.canonicalOracleSqls]]) as an
  * oracle_sql.json, so `tools/check_oracle.py` can replay the banded
  * dedup family at sf1 within the oracle budget (SURVEY §5). The
  * driver's correctness gate keeps the literal forms; these twins are
  * value-identical by construction (every emitted value is a pure
  * function of document content).
  *
  * Usage: runMain graft.ScaleOracles <outPath.json>
  */
object ScaleOracles {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/canonical_oracles.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = operators.Dedup.canonicalOracleSqls
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${operators.Dedup.canonicalOracleSqls.size} canonical oracles to $out")
  }
}
