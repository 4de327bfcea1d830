package object graft {
  /** A named query in the correctness/bench inventory: given a session and a
    * scale-factor directory (e.g. "/root/testdata/sf0.01"), produce a
    * deterministic DataFrame. Every query MUST end in an explicit orderBy on
    * a unique key so row order matches the DuckDB oracle byte-for-byte.
    */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
