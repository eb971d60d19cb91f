package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parser for SAS-labels-style mapping files: named sections of
  * `key = 'value'` lines terminated by `;` (reference code_mapper,
  * etl.py:47-60). The file is driver-side metadata (a few KB), so the
  * parse is a pure function; the result becomes a broadcastable dim.
  */
object LabelFile {

  /** Extract `key -> value` pairs from the section starting at the first
    * occurrence of `sectionKey` up to the terminating `;`. */
  def section(content: String, sectionKey: String): Seq[(String, String)] = {
    val start = content.indexOf(sectionKey)
    if (start < 0) Seq.empty
    else {
      val body = content.substring(start)
      val end = body.indexOf(';')
      val block = if (end < 0) body else body.substring(0, end)
      block.linesIterator.drop(1)
        .map(_.replace("'", "").replace("\t", ""))
        .map(_.split("=", 2))
        .collect { case Array(k, v) => (k.trim, v.trim) }
        .filter { case (k, v) => k.nonEmpty && v.nonEmpty }
        .toSeq
    }
  }

  /** Section -> two-column DataFrame dimension. */
  def toDF(spark: SparkSession, content: String, sectionKey: String,
           keyCol: String, valCol: String): DataFrame = {
    import spark.implicits._
    section(content, sectionKey).toDF(keyCol, valCol)
  }
}
