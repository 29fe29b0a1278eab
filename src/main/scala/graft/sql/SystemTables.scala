package graft.sql

import graft.lake.Manifest
import org.apache.spark.sql.functions._

/** The `system` and `information_schema` views, synthesized from the
  * catalog + manifest logs on registration (reference
  * `src/system_tables.rs`, golden output `tests/statements/query.rs:15-63`).
  */
object SystemTables {

  def registerAll(ctx: GraftContext): Unit =
    registerInto(ctx, ctx.spark, ctx.currentDb)

  /** Register the system views into an arbitrary session (the concurrent
    * read path materializes them per catalog snapshot, not per context). */
  def registerInto(ctx: GraftContext, spark: org.apache.spark.sql.SparkSession,
                   db: String): Unit = {
    import spark.implicits._

    val tables = ctx.catalog.listTables(db)

    // system.table_versions: one row per (table, version). Reads are
    // lock-free, so this enumeration RACES the background GC sweep
    // (GraftContext.gcSweep vacuums non-latest manifests without
    // coordinating with readers, by design): a version file can vanish
    // between listVersions and the read. Treat that as "vacuumed
    // concurrently" and skip the row — this snapshot serializes after the
    // sweep — exactly like buildSnapshot skips a manifestless table. A
    // pure SELECT must never fail on an unrelated table's retention sweep.
    val versions = tables.flatMap { case (sch, name, uuid) =>
      Manifest.listVersions(ctx.catalog.tableRoot(uuid)).flatMap { v =>
        Manifest.readOpt(ctx.catalog.tableRoot(uuid), v).map { m =>
          (sch, name, v, v, m.timestampMs / 1000)
        }
      }
    }
    versions.toDF("table_schema", "table_name", "table_version_id", "version", "creation_time")
      .createOrReplaceTempView("system__table_versions")

    // system.dropped_tables
    ctx.catalog.droppedTables
      .map(d => (d.schema, d.name, d.uuid, "PENDING", d.dropTimeMs / 1000))
      .toDF("table_schema", "table_name", "uuid", "deletion_status", "drop_time")
      .createOrReplaceTempView("system__dropped_tables")

    // information_schema.tables / columns — the reference lists its own
    // information_schema views alongside base tables (golden layout
    // tests/statements/query.rs:15-31, ddl.rs:192-206)
    val infoViews = Seq("check_constraints", "columns", "df_settings", "parameters",
      "routines", "schemata", "table_constraints", "tables", "views")
    val infoTables = tables.map { case (sch, name, _) => (db, sch, name, "BASE TABLE") } ++
      Seq((db, "system", "table_versions", "VIEW"),
        (db, "system", "dropped_tables", "VIEW")) ++
      infoViews.map(v => (db, "information_schema", v, "VIEW"))
    infoTables.toDF("table_catalog", "table_schema", "table_name", "table_type")
      .createOrReplaceTempView("information_schema__tables")

    // readLatestOpt (not readLatest): the whole table can be dropped +
    // collected by another process between our catalog listing and here
    val cols = tables.flatMap { case (sch, name, uuid) =>
      Manifest.readLatestOpt(ctx.catalog.tableRoot(uuid)).toSeq.flatMap { m =>
        val st = org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        st.fields.zipWithIndex.map { case (f, i) =>
          (db, sch, name, f.name, i + 1, if (f.nullable) "YES" else "NO", f.dataType.sql)
        }
      }
    }
    cols.toDF("table_catalog", "table_schema", "table_name", "column_name",
        "ordinal_position", "is_nullable", "data_type")
      .createOrReplaceTempView("information_schema__columns")

    // information_schema.routines: persisted CREATE FUNCTION entries
    // (reference exposes routines/parameters for its function catalog)
    ctx.catalog.functions.toSeq.sortBy(_._1)
      .map { case (n, details) => (db, "public", n, "FUNCTION", details) }
      .toDF("routine_catalog", "routine_schema", "routine_name", "routine_type",
        "routine_definition")
      .createOrReplaceTempView("information_schema__routines")

    // information_schema.parameters: one row per routine input (IN, by
    // position) plus the result row (OUT) — the reference exposes its
    // function catalog through the standard layout
    val params = ctx.catalog.functions.toSeq.sortBy(_._1).flatMap { case (n, json) =>
      val d = Functions.parse(json)
      d.inputTypes.zipWithIndex.map { case (t, i) =>
        (db, "public", n, i + 1L, "IN", t.toUpperCase)
      } :+ ((db, "public", n, 0L, "OUT", d.returnType.toUpperCase))
    }
    params.toDF("specific_catalog", "specific_schema", "specific_name",
        "ordinal_position", "parameter_mode", "data_type")
      .createOrReplaceTempView("information_schema__parameters")

    // information_schema.schemata: catalog schemas + the synthesized ones
    val schemata = (ctx.catalog.listSchemas(db) ++ Seq("information_schema", "system"))
      .distinct.sorted.map(s => (db, s, null.asInstanceOf[String]))
    schemata.toDF("catalog_name", "schema_name", "owner")
      .createOrReplaceTempView("information_schema__schemata")

    // information_schema.views: CREATE VIEW is rejected for parity, so
    // the relation is always empty — but present, with the standard shape
    Seq.empty[(String, String, String, String)]
      .toDF("table_catalog", "table_schema", "table_name", "definition")
      .createOrReplaceTempView("information_schema__views")

    // information_schema.df_settings analog: the session's SQL settings
    spark.conf.getAll.toSeq.sortBy(_._1).toDF("name", "value")
      .createOrReplaceTempView("information_schema__df_settings")

    // information_schema.table_constraints + check_constraints: the
    // standard two-view layout over the lake tables' CHECK constraints
    val constraints = tables.flatMap { case (sch, name, uuid) =>
      // tolerate the table vanishing under us (drop + gc in another
      // process between the exists probe and the read), same rationale
      // as the version walk above
      val cs = try new graft.lake.GraftTable(spark, ctx.catalog.tableRoot(uuid)).constraints
        catch { case _: java.io.FileNotFoundException => Nil }
      cs.map { case (cn, ce) => (db, sch, name, cn, ce) }
    }
    constraints.map { case (cat, sch, name, cn, _) => (cat, sch, cn, cat, sch, name, "CHECK") }
      .toDF("constraint_catalog", "constraint_schema", "constraint_name",
        "table_catalog", "table_schema", "table_name", "constraint_type")
      .createOrReplaceTempView("information_schema__table_constraints")
    constraints.map { case (cat, sch, _, cn, ce) => (cat, sch, cn, ce) }
      .toDF("constraint_catalog", "constraint_schema", "constraint_name", "check_clause")
      .createOrReplaceTempView("information_schema__check_constraints")
  }
}
