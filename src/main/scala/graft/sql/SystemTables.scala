package graft.sql

import graft.lake.Manifest
import org.apache.spark.sql.functions._

/** The `system` and `information_schema` views, synthesized from the
  * catalog + manifest logs on registration (reference
  * `src/system_tables.rs`, golden output `tests/statements/query.rs:15-63`).
  */
object SystemTables {

  def registerAll(ctx: GraftContext): Unit = {
    val spark = ctx.spark
    import spark.implicits._

    val tables = ctx.catalog.listTables("default")

    // system.table_versions: one row per (table, version)
    val versions = tables.flatMap { case (sch, name, uuid) =>
      Manifest.listVersions(ctx.catalog.tableRoot(uuid)).map { v =>
        val m = Manifest.read(ctx.catalog.tableRoot(uuid), v)
        (sch, name, v, v, m.timestampMs / 1000)
      }
    }
    versions.toDF("table_schema", "table_name", "table_version_id", "version", "creation_time")
      .createOrReplaceTempView("system__table_versions")

    // system.dropped_tables
    ctx.catalog.droppedTables
      .map(d => (d.schema, d.name, d.uuid, "PENDING", d.dropTimeMs / 1000))
      .toDF("table_schema", "table_name", "uuid", "deletion_status", "drop_time")
      .createOrReplaceTempView("system__dropped_tables")

    // information_schema.tables / columns
    val infoTables = tables.map { case (sch, name, _) => ("default", sch, name, "BASE TABLE") } ++
      Seq(("default", "system", "table_versions", "VIEW"),
        ("default", "system", "dropped_tables", "VIEW"))
    infoTables.toDF("table_catalog", "table_schema", "table_name", "table_type")
      .createOrReplaceTempView("information_schema__tables")

    val cols = tables.flatMap { case (sch, name, uuid) =>
      Manifest.readLatest(ctx.catalog.tableRoot(uuid)).toSeq.flatMap { m =>
        val st = org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        st.fields.zipWithIndex.map { case (f, i) =>
          ("default", sch, name, f.name, i + 1, if (f.nullable) "YES" else "NO", f.dataType.sql)
        }
      }
    }
    cols.toDF("table_catalog", "table_schema", "table_name", "column_name",
        "ordinal_position", "is_nullable", "data_type")
      .createOrReplaceTempView("information_schema__columns")
  }
}
