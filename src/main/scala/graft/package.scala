package object graft {
  /** A named operator: (session, scale-factor dir) => result.
    * The driver's contract type for SparkEntry.queries values. */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
