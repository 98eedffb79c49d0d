package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.explode

import scala.collection.mutable

/** The reference's public API surface re-expressed over DataFrames:
  * named pipes + producer/stage/branching-stage/flattener/consumer nodes
  * (`/root/reference/src/pipeline/builder.rs:31-408`), with the same
  * build-time validation semantics (`builder.rs:419-517`,
  * `mod.rs:399-421`):
  *
  *  - at least one producer      → "pipeline must have at least one producer"
  *  - one reader per pipe        → "reader was already used"
  *  - every written pipe is read → "pipeline has open-ended pipe: '<name>'"
  *
  * Semantics mapping (SURVEY.md §1.4): a pipe is a named DataFrame edge;
  * multiple writers to one pipe fan-in as UNION ALL (bag semantics,
  * `builder.rs:523-525`); a stage is a DataFrame transform (its Option-drop
  * filtering is just... a filter); cycles (`README.md:56-108`) run as a
  * driver-side fixpoint loop with per-iteration localCheckpoint to cut
  * lineage — Spark DAGs are acyclic, so iteration is the only rendering
  * (Pregel pattern).
  *
  * Where the reference erases types to `BoxedAnySend` and downcast-panics
  * at runtime (`mod.rs:445-453`), each pipe here carries a concrete schema
  * checked at analysis time — strictly stronger.
  *
  * Scale: the DSL only *composes* DataFrames; everything Catalyst sees is
  * the same declarative plan you'd write by hand, so pushdown/pruning/
  * broadcast all apply unchanged. The fixpoint loop keeps per-iteration
  * frontiers as checkpointed DataFrames — cluster-sized frontiers are fine;
  * only the empty-check is an action.
  */
object PipeGraph {
  def builder: Builder = new Builder(Vector.empty)

  /** R15 `WorkerOptions` analog: concurrency knobs per stage.
    * `ordered` ≈ `default_single_task()` (sequential FIFO);
    * `maxParallelism` ≈ `max_task_count` (caps concurrent tasks);
    * `maxBatchFiles` ≈ `pipe_buffer_size` (`mod.rs:25,52-55`) — the
    * backpressure bound on how much an unbounded producer may push into
    * one microbatch, mapped to the streaming source's `maxFilesPerTrigger`
    * (see `StreamingOps.eventsStream`; a rate/offset source would map it
    * to `maxOffsetsPerTrigger` the same way).
    */
  final case class PipeOptions(
      ordered: Boolean = false, maxParallelism: Option[Int] = None,
      maxBatchFiles: Option[Int] = None) {
    private[pipeline] def apply(df: DataFrame): DataFrame =
      if (ordered) df.coalesce(1)
      else maxParallelism.map(df.coalesce).getOrElse(df)
  }

  private[pipeline] sealed trait Node {
    def reads: Option[String]
    def writes: Seq[String]
    def isProducer: Boolean = reads.isEmpty && writes.nonEmpty
  }
  private[pipeline] final case class Producer(
      out: String, make: SparkSession => DataFrame) extends Node {
    val reads: Option[String] = None
    val writes: Seq[String] = Seq(out)
  }
  private[pipeline] final case class Transform(
      in: String, outs: Seq[String],
      op: DataFrame => Seq[DataFrame]) extends Node {
    val reads: Option[String] = Some(in)
    val writes: Seq[String] = outs
  }
  private[pipeline] final case class Consumer(
      in: String, sink: DataFrame => Unit) extends Node {
    val reads: Option[String] = Some(in)
    val writes: Seq[String] = Seq.empty
  }

  /** Immutable builder, mirroring `PipelineBuilder`'s `with_*` surface. */
  final class Builder private[pipeline] (nodes: Vector[Node]) {
    private def add(n: Node) = new Builder(nodes :+ n)

    /** R1 `with_inputs`: static literal source. */
    def inputs(pipe: String, make: SparkSession => DataFrame): Builder =
      add(Producer(pipe, make))

    /** R3 `with_producer`: dynamic source (any DataFrame-yielding fn). */
    def producer(pipe: String)(make: SparkSession => DataFrame): Builder =
      add(Producer(pipe, make))

    /** R2 `with_branching_inputs` / R14 `branch_inputs!`: static multi-
      * output source — the i-th DataFrame feeds the i-th pipe (the
      * reference boxes tuple positions; here each position is a typed DF).
      */
    def branchingInputs(pipes: Seq[String],
        make: SparkSession => Seq[DataFrame]): Builder =
      branchingProducer(pipes)(make)

    /** R4 `with_branching_producer`: dynamic multi-output source; a `None`
      * slot in the reference skips a pipe — here an empty DataFrame is the
      * equivalent (bag semantics make them identical downstream).
      */
    def branchingProducer(pipes: Seq[String])(
        make: SparkSession => Seq[DataFrame]): Builder =
      pipes.zipWithIndex.foldLeft(this) { case (b, (pipe, i)) =>
        b.add(Producer(pipe, s => {
          val dfs = make(s)
          require(dfs.length == pipes.length,
            s"branching producer returned ${dfs.length} outputs for ${pipes.length} pipes")
          dfs(i)
        }))
      }

    /** R5 `with_stage`: 1-in/1-out map+filter (Option-drop ≡ filter). */
    def stage(in: String, out: String)(op: DataFrame => DataFrame): Builder =
      add(Transform(in, Seq(out), df => Seq(op(df))))

    /** R5 + R15 `WorkerOptions`: `opts.ordered` renders the reference's
      * single-task FIFO mode (`default_single_task`, mod.rs:67-74) as
      * coalesce(1) — one sequential task; `opts.maxParallelism` caps the
      * partition count like `max_task_count` caps concurrent tasks.
      */
    def stage(in: String, out: String, opts: PipeOptions)(
        op: DataFrame => DataFrame): Builder =
      add(Transform(in, Seq(out), df => Seq(op(opts(df)))))

    /** R6 `with_branching_stage`: 1-in/N-out router; one DataFrame per
      * output pipe (each with its own schema — the reference's per-branch
      * `BoxedAnySend` heterogeneity, `builder.rs:241-245`).
      */
    def branchingStage(in: String, outs: Seq[String])(
        op: DataFrame => Seq[DataFrame]): Builder =
      add(Transform(in, outs, df => {
        val r = op(df)
        require(r.length == outs.length,
          s"branching stage returned ${r.length} outputs for ${outs.length} pipes")
        r
      }))

    /** R8 `with_flattener`: explode an array column. */
    def flattener(in: String, out: String, column: String): Builder =
      add(Transform(in, Seq(out),
        df => Seq(df.withColumn(column, explode(df(column))))))

    /** R8 `with_flattener`, generic form: the reference flattens any
      * `IntoIterator` VALUE (`builder.rs:336-364`), not just a named
      * array column — the typed analog is a pipe of `Seq[T]` rows
      * flattened to a pipe of `T` rows (`Dataset[Seq[T]] → Dataset[T]`).
      * Lowered as the same generator (explode) the column form uses, so
      * it stays a narrow codegen'd operator, not a lambda flatMap.
      */
    def flattenerSeq[T](in: String, out: String)(
        implicit enc: org.apache.spark.sql.Encoder[T],
        seqEnc: org.apache.spark.sql.Encoder[Seq[T]]): Builder =
      add(Transform(in, Seq(out),
        df => Seq(df.as[Seq[T]](seqEnc).flatMap(identity)(enc).toDF())))

    /** R7 `with_consumer`: terminal sink. */
    def consumer(pipe: String)(sink: DataFrame => Unit): Builder =
      add(Consumer(pipe, sink))

    /** R9 `also`: fragment composition. */
    def also(f: Builder => Builder): Builder = f(this)

    /** Build-time validation (R20), mirroring the reference's errors. */
    def build(): Either[String, PipeGraph] = {
      if (!nodes.exists(_.isProducer))
        return Left("pipeline must have at least one producer")
      val readers = nodes.flatMap(_.reads)
      readers.diff(readers.distinct).distinct.headOption match {
        case Some(_) => return Left("reader was already used")
        case None =>
      }
      val readSet = readers.toSet
      nodes.flatMap(_.writes).find(p => !readSet.contains(p)) match {
        case Some(p) => return Left(s"pipeline has open-ended pipe: '$p'")
        case None =>
      }
      Right(new PipeGraph(nodes))
    }
  }
}

/** A validated pipeline; `run` executes it (≈ `Pipeline::wait`,
  * `/root/reference/src/pipeline/mod.rs:357-396` — in batch, Spark's DAG
  * completion replaces the reference's counter-based quiescence detection).
  *
  * Returns the final content of every pipe (post-run, for asserts — the
  * consume-and-assert style of the reference's tests).
  */
final class PipeGraph private[pipeline] (nodes: Vector[PipeGraph.Node]) {
  import PipeGraph._

  /** Stage-level strongly connected components (Tarjan), so cyclic regions
    * can be iterated as a block while the acyclic rest lowers directly.
    */
  private def sccs: Vector[Vector[Int]] = {
    val n = nodes.length
    // edge i -> j if a pipe written by i is read by j
    val adj = Array.tabulate(n) { i =>
      (0 until n).filter(j => nodes(i).writes.exists(nodes(j).reads.contains(_)))
    }
    val index = Array.fill(n)(-1)
    val low = Array.fill(n)(0)
    val onStack = Array.fill(n)(false)
    val stack = mutable.Stack[Int]()
    var counter = 0
    val out = mutable.ArrayBuffer[Vector[Int]]()
    def strongconnect(v: Int): Unit = {
      index(v) = counter; low(v) = counter; counter += 1
      stack.push(v); onStack(v) = true
      adj(v).foreach { w =>
        if (index(w) == -1) { strongconnect(w); low(v) = math.min(low(v), low(w)) }
        else if (onStack(w)) low(v) = math.min(low(v), index(w))
      }
      if (low(v) == index(v)) {
        val comp = mutable.ArrayBuffer[Int]()
        var w = -1
        while (w != v) { w = stack.pop(); onStack(w) = false; comp += w }
        out += comp.toVector
      }
    }
    (0 until n).foreach(v => if (index(v) == -1) strongconnect(v))
    out.toVector // reverse-topological order
  }

  def run(spark: SparkSession, maxIterations: Int = 100): Map[String, DataFrame] = {
    // pipe -> accumulated content (union of all writes)
    val pipes = mutable.Map[String, DataFrame]()
    def write(pipe: String, df: DataFrame): Unit =
      pipes(pipe) = pipes.get(pipe).map(_.union(df)).getOrElse(df)

    val comps = sccs.reverse // topological order
    comps.foreach { comp =>
      val isCycle = comp.length > 1 || {
        val i = comp.head
        nodes(i).writes.exists(nodes(i).reads.contains(_))
      }
      if (!isCycle) {
        val node = nodes(comp.head)
        node match {
          case Producer(out, make) => write(out, make(spark))
          case Transform(in, outs, op) =>
            pipes.get(in).foreach { df =>
              outs.zip(op(df)).foreach { case (p, o) => write(p, o) }
            }
          case Consumer(in, sink) => pipes.get(in).foreach(sink)
        }
      } else {
        runCycle(spark, comp, pipes, write, maxIterations)
      }
    }
    pipes.toMap
  }

  /** Fixpoint execution of one cyclic component: seed each in-cycle pipe
    * with its external contributions, then repeatedly apply the cycle's
    * stages to the current frontier until every frontier pipe is empty.
    * localCheckpoint per iteration cuts lineage (otherwise the plan grows
    * linearly with iteration count and the driver OOMs — SURVEY §7.4).
    * Emissions to pipes *outside* the cycle accumulate as ordinary writes.
    */
  private def runCycle(
      spark: SparkSession,
      comp: Vector[Int],
      pipes: mutable.Map[String, DataFrame],
      write: (String, DataFrame) => Unit,
      maxIterations: Int): Unit = {
    val inCycle = comp.toSet
    val cyclePipes = comp.flatMap(i => nodes(i).reads).toSet
    // frontier: per-pipe current batch (starts as the externally-seeded content)
    var frontier: Map[String, DataFrame] =
      cyclePipes.iterator.flatMap(p => pipes.get(p).map(p -> _)).toMap
    // record full accumulated content of cycle pipes as we go
    frontier.foreach { case (p, df) => pipes(p) = df }

    var iter = 0
    while (frontier.nonEmpty && iter < maxIterations) {
      val next = mutable.Map[String, DataFrame]()
      comp.foreach { i =>
        nodes(i) match {
          case Transform(in, outs, op) if inCycle(i) =>
            frontier.get(in).foreach { df =>
              outs.zip(op(df)).foreach { case (p, o) =>
                if (cyclePipes.contains(p)) {
                  val chk = o.localCheckpoint(true)
                  next(p) = next.get(p).map(_.union(chk)).getOrElse(chk)
                } else write(p, o.localCheckpoint(true))
              }
            }
          case _ =>
        }
      }
      frontier = next.filter { case (_, df) => !df.isEmpty }.toMap
      frontier.foreach { case (p, df) =>
        pipes(p) = pipes.get(p).map(_.union(df)).getOrElse(df)
      }
      iter += 1
    }
    if (frontier.nonEmpty)
      throw new IllegalStateException(
        s"cycle did not converge within $maxIterations iterations")
  }
}
