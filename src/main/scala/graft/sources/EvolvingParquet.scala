package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-evolution-tolerant multi-snapshot parquet ingest — the
  * source-robustness gap a multi-year crawl actually hits: snapshot
  * generations add columns (a new quality score, a fetch-depth field)
  * and drop columns (a deprecated tag), and the union over generations
  * must neither fail nor silently misalign.
  *
  * Contract (strict, the Jsonl discipline applied to schema drift):
  *  - columns are matched BY NAME across snapshots (never by position —
  *    positional union is how a reordered writer silently swaps two
  *    string columns);
  *  - a column missing from a snapshot reads as NULL there (both
  *    directions: dropped-in-new and added-in-new);
  *  - a column present in two snapshots under INCOMPATIBLE types is a
  *    NAMED error naming the column and both types — silent numeric
  *    coercion (int ↔ string, long ↔ double) corrupts at scale and is
  *    exactly the failure mode this refuses;
  *  - every row is stamped with its snapshot of origin, so lineage
  *    survives the union.
  *
  * Scale shape: each snapshot is one parquet scan (schemas come from
  * footers, no data pass); the union is a zero-shuffle UnionExec over
  * the scans with NULL-fill projections — filters and column pruning
  * push through to each branch. */
object EvolvingParquet {

  /** Read `(snapshotName, path)` parquet snapshots and union them by
    * name, NULL-filling columns a snapshot lacks; adds a `snapshot`
    * column. Named error on a cross-snapshot column-type conflict. */
  def readUnion(spark: SparkSession, snapshots: Seq[(String, String)]): DataFrame = {
    require(snapshots.nonEmpty, "readUnion: no snapshots given")
    val frames = snapshots.map { case (name, path) =>
      (name, spark.read.parquet(path))
    }
    // strict cross-snapshot type check before any union
    val seen = scala.collection.mutable.Map.empty[String, (String, org.apache.spark.sql.types.DataType)]
    frames.foreach { case (name, df) =>
      df.schema.fields.foreach { f =>
        seen.get(f.name) match {
          case Some((prevSnap, prevType)) if prevType != f.dataType =>
            throw new IllegalArgumentException(
              s"readUnion: column '${f.name}' has conflicting types across " +
                s"snapshots: ${prevType.simpleString} in '$prevSnap' vs " +
                s"${f.dataType.simpleString} in '$name' — refusing to coerce")
          case None => seen(f.name) = (name, f.dataType)
          case _ => ()
        }
      }
    }
    // the lineage column must not silently shadow a data column
    frames.foreach { case (name, df) =>
      require(!df.columns.contains("snapshot"),
        s"readUnion: snapshot '$name' already has a 'snapshot' column — " +
          "the lineage stamp would silently overwrite it")
    }
    frames.map { case (name, df) =>
      df.withColumn("snapshot", lit(name))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
