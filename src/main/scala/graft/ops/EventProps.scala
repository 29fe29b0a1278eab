package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Cheap extraction of `$.k` from events.props.
  *
  * The generator writes props as exactly `{"k": N}` (single key, one
  * space, no escapes — OpsSpec pins this row-for-row against
  * get_json_object at every test SF, so data drift fails loudly, the
  * floor-half quantization precedent). `get_json_object` spins up a
  * Jackson parse PER ROW (~µs) — measured as a third of the gr family's
  * edge-derivation stage, paid by every gr/ev item query over 100% of
  * event rows. The fixed-layout substring is one codegen'd byte slice.
  *
  * JSON-SURFACE queries (q27_json_funcs, f2's json probes) deliberately
  * keep the real JSON path functions — this helper is for compute
  * pipelines where the value, not the JSON semantics, is the query.
  */
object EventProps {
  /** `CAST(props->>'k' AS BIGINT)` under the pinned fixed layout:
    * substring(props, 7, length-7) — drops `{"k": ` and the trailing
    * `}`. NULL props stay NULL (substr and cast are null-preserving,
    * exactly like get_json_object). */
  def propsK(props: Column): Column =
    props.substr(lit(7), length(props) - 7).cast(LongType)
}
