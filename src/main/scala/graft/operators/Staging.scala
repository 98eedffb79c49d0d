package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Shared lifecycle for content-keyed staged fixture directories under
  * `java.io.tmpdir` (`graft_stream_*`, `graft_docstream_*`,
  * `graft_embstream_*`, ...): every stager writes to a private
  * `<staged>_tmp_<uuid>` dir and publishes it with an ATOMIC_MOVE rename,
  * so readers only ever see complete fixtures and concurrent stagers
  * race harmlessly (loser's move throws, winner's fixture is used).
  *
  * r15 advice #2 closed here for ALL stagers, not just the flagged one:
  *  - the race-LOSER's tmp dir used to be leaked (the r14 /tmp-growth
  *    defect class) — [[publish]] deletes it in the catch branch;
  *  - one staged copy per CORPUS VERSION accumulated forever —
  *    [[sweepStale]] removes same-prefix dirs whose content key differs
  *    from the current one before staging, plus abandoned `_tmp_` dirs
  *    older than a day (a LIVE concurrent stager's tmp dir is minutes
  *    old and must not be swept from under it).
  */
private[graft] object Staging {

  private def deleteRecursively(p: Path): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)

  /** Atomic publish of a fully-written tmp dir; on race loss the winner's
    * fixture stands and OUR tmp dir is removed instead of leaked.
    */
  def publish(tmp: Path, staged: Path): Unit =
    try Files.move(tmp, staged, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: java.nio.file.DirectoryNotEmptyException =>
        deleteRecursively(tmp)
    }

  /** Remove stale same-prefix staged dirs (`keep` rejects them — pass a
    * predicate accepting every CURRENT content key, e.g. all of a
    * multi-variant stager's live variants) and day-old abandoned tmp
    * dirs. Call before staging.
    *
    * Committed dirs are only swept past a 2 h age gate: the content key
    * hashes the SOURCE DIR too, so "different key" includes the other
    * scale factors' perfectly-live fixtures — a tri-SF verify sweep (or
    * a concurrent test JVM reading sf0.001 while Verify stages sf0.01)
    * must not have its fixture deleted mid-stream. Within one gate
    * sequence everything is fresher than the gate; across rounds the
    * accumulation (the r15 advice #2 leak) still drains.
    */
  def sweepStale(prefix: String, keep: String => Boolean): Unit = {
    val tmpRoot = Paths.get(sys.props("java.io.tmpdir"))
    val now = System.currentTimeMillis()
    val dayAgo = now - 24L * 3600 * 1000
    val twoHoursAgo = now - 2L * 3600 * 1000
    Option(tmpRoot.toFile.listFiles()).getOrElse(Array.empty)
      .filter { f =>
        val n = f.getName
        n.startsWith(prefix) && {
          // tmp dirs may belong to a LIVE concurrent stager (any key) —
          // sweep only when abandoned.
          if (n.contains("_tmp_")) f.lastModified() < dayAgo
          else !keep(n) && f.lastModified() < twoHoursAgo
        }
      }
      .foreach(f => deleteRecursively(f.toPath))
  }
}
