package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 (SURVEY §2.1) — raw-source scans.
  *
  * The reference ingests each city portal CSV with every column typed as a
  * string ("all variables initially typed as strings",
  * `Baltimore-notebook.ipynb:266-274`): no inference, so nothing is lost or
  * coerced before harmonization imposes types deliberately. At 100 TB this
  * is also the scan you want — schema inference is an extra full pass over
  * the data; a fixed all-strings schema reads once.
  */
object Sources {

  /** Headered CSV scan with no schema inference — every column a string. */
  def csvAllStrings(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .csv(path)
}
