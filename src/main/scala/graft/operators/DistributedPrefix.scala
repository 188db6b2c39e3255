package graft.operators

import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset

/** The two-phase broadcast-prefix SCAN — the distributed replacement
  * for a global `... OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`
  * window, which funnels the whole input through ONE reducer (the
  * classic scale-killer). Used by sequence packing (q77, running
  * sum), shard manifests (q136, running count) and the skyline
  * frontier (q135, running max).
  *
  * Phase 1 folds one partition-local aggregate per partition and
  * collects them — O(partitions) scalars, never rows. Phase 2
  * broadcasts the EXCLUSIVE prefix combine of those aggregates and
  * finishes the scan partition-locally: each row sees the fold of
  * everything strictly before it in the global order.
  *
  * `ds` must already be range-partitioned and sorted within
  * partitions in the global order the prefix is over (partition i
  * holds smaller keys than partition i+1). Both phases reuse ONE
  * materialized RDD lineage, so the shuffle output — and therefore
  * the partition indexing the broadcast prefix is keyed by — is
  * identical across the two jobs by construction.
  *
  * `add` folds a row into the running aggregate; `merge` combines two
  * partition aggregates (must agree with `add`'s monoid); `emit` maps
  * (aggregate-before-this-row, row) to an output row.
  */
object DistributedPrefix {
  def scan[T, A: ClassTag, R: ClassTag](
      ds: Dataset[T], zero: A,
      add: (A, T) => A, merge: (A, A) => A)(
      emit: (A, T) => R): RDD[R] = {
    val rdd = ds.rdd // ONE lineage shared by both phases
    val parts = rdd.mapPartitionsWithIndex { (pid, it) =>
      Iterator.single((pid, it.foldLeft(zero)(add)))
    }.collect().sortBy(_._1).map(_._2)
    val prefix = ds.sparkSession.sparkContext.broadcast(
      parts.scanLeft(zero)(merge))
    rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = prefix.value(pid)
      it.map { t =>
        val r = emit(acc, t)
        acc = add(acc, t)
        r
      }
    }
  }
}
