package graft.sources

import org.apache.spark.sql.SparkSession

/** Config-file session bootstrap — the operational twin of the
  * reference's `config.cfg` + configparser startup (etl.py:16-33): an
  * INI file with a `[Spark]` section whose keys become
  * `SparkSession.builder` configs, so deployments move memory /
  * broadcast-timeout knobs between environments without recompiling.
  *
  * Key mapping (reference names kept, case-insensitive):
  *   - `Memory`            → `spark.driver.memory`   (etl.py:31)
  *   - `Broadcast_Timeout` → `spark.sql.broadcastTimeout` (etl.py:32)
  *   - any key already written as a dotted `spark.*` property passes
  *     through verbatim — the escape hatch the alias table can't cover.
  *
  * The reference's `[OS]` section (JAVA_HOME/PATH/SPARK_HOME/
  * HADOOP_HOME, etl.py:26-29) is exposed via [[osEnv]] for the LAUNCH
  * script to export — a JVM cannot reset its own environment, and the
  * reference only needs those values because it boots Spark from a
  * Python process; under spark-submit they are already set.
  *
  * Parsing is deliberately minimal-but-strict configparser subset:
  * `[section]` headers, `key = value` (first `=` or `:` splits),
  * `;`/`#` full-line comments, blank lines, whitespace trimmed, later
  * duplicate keys win (configparser semantics). Anything else is a
  * parse error, not a guess.
  */
object Config {

  /** Parse INI text into section → (key → value), sections and keys
    * lowercased (configparser lowercases keys; we extend to sections
    * so lookups are total). */
  def parseIni(text: String): Map[String, Map[String, String]] = {
    var section = ""
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    for ((raw, i) <- text.linesIterator.zipWithIndex) {
      val line = raw.trim
      if (line.isEmpty || line.startsWith(";") || line.startsWith("#")) ()
      else if (line.startsWith("[") && line.endsWith("]")) {
        section = line.substring(1, line.length - 1).trim.toLowerCase
        out.getOrElseUpdate(section,
          scala.collection.mutable.LinkedHashMap.empty)
      } else {
        val cut = line.indexWhere(c => c == '=' || c == ':')
        require(cut > 0,
          s"Config.parseIni: line ${i + 1} is neither a [section], a " +
          s"comment, nor a key = value pair: '$line'")
        val k = line.substring(0, cut).trim.toLowerCase
        val v = line.substring(cut + 1).trim
        out.getOrElseUpdate(section,
          scala.collection.mutable.LinkedHashMap.empty).update(k, v)
      }
    }
    out.map { case (s, kv) => s -> kv.toMap }.toMap
  }

  /** The `[Spark]` section as Spark properties: reference aliases
    * mapped, dotted `spark.*` keys passed through, anything else
    * rejected (a typo'd knob silently ignored is a production outage
    * found weeks later). */
  def sparkConf(ini: Map[String, Map[String, String]]): Map[String, String] = {
    val aliases = Map(
      "memory" -> "spark.driver.memory",
      "broadcast_timeout" -> "spark.sql.broadcastTimeout")
    ini.getOrElse("spark", Map.empty).map { case (k, v) =>
      aliases.get(k) match {
        case Some(prop) => prop -> v
        case None if k.startsWith("spark.") => k -> v
        case None => throw new IllegalArgumentException(
          s"Config.sparkConf: unknown [Spark] key '$k' — use one of " +
          s"${aliases.keys.toSeq.sorted.mkString("/")} or a full " +
          "dotted spark.* property name")
      }
    }
  }

  /** The `[OS]` section verbatim (original key case lost to
    * configparser lowercasing, as in the reference) — for the launcher
    * to export; never applied to this JVM. */
  def osEnv(ini: Map[String, Map[String, String]]): Map[String, String] =
    ini.getOrElse("os", Map.empty)

  def parseIniFile(path: String): Map[String, Map[String, String]] =
    parseIni(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  /** The reference's whole bootstrap in one call: read the INI, apply
    * the `[Spark]` section to a builder, and getOrCreate. Session-level
    * properties (memory) only take effect when this call CREATES the
    * context — matching `SparkSession.builder` semantics, not hiding
    * them. */
  def sessionFromIni(path: String,
                     master: Option[String] = None): SparkSession = {
    val conf = sparkConf(parseIniFile(path))
    val b0 = SparkSession.builder()
    val b1 = master.fold(b0)(b0.master)
    conf.foldLeft(b1) { case (b, (k, v)) => b.config(k, v) }.getOrCreate()
  }
}
