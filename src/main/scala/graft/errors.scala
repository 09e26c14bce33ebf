package graft

/** Error surface mirroring the reference plugin's contract
  * (ref: feast_hive/hive_source.py:237,243,247; feast_hive/hive.py:222-224,391).
  */
class DataSourceNotFoundException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** Query-backed source must carry an explicit name
  * (ref: feast_hive/hive_source.py:108). */
class DataSourceNoNameException()
    extends RuntimeException(
      "Name must be specified for a data source defined by a query")

/** Entity dataframe is missing expected join keys / the event timestamp column
  * (ref: feast_hive/hive.py:222-224). */
class EntityDfMissingColumnsError(expected: Seq[String], missing: Seq[String])
    extends RuntimeException(
      s"The entity dataframe is missing columns ${missing.mkString(", ")} " +
        s"(expected: ${expected.mkString(", ")})")

/** Entity dataframe argument was neither a DataFrame nor a SQL string
  * (ref: feast_hive/hive.py:391). */
class InvalidEntityTypeException(got: String)
    extends RuntimeException(
      s"Invalid entity_df type: $got (expected DataFrame or SQL string)")
