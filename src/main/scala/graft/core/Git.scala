package graft.core

import scala.sys.process._

/** Git integration for sweep provenance (ref psweep.py:406-446 `git_enter`/
  * `git_exit`): before a run, require a clean work tree or auto-commit;
  * after, commit run outputs with the run id in the message. Driver-side
  * shell-outs, same as the reference.
  */
object Git {

  private var lastRunId: Option[String] = None

  private def git(cwd: String, args: String*): (Int, String) = {
    val out = new StringBuilder
    val code = Process("git" +: args, new java.io.File(cwd))
      .!(ProcessLogger(l => { out.append(l).append('\n'); () }))
    (code, out.toString)
  }

  def isRepo(cwd: String): Boolean =
    new java.io.File(cwd).isDirectory &&
      git(cwd, "rev-parse", "--is-inside-work-tree")._1 == 0

  def dirty(cwd: String): Boolean =
    git(cwd, "status", "--porcelain")._2.trim.nonEmpty

  /** Auto-commit any dirty state before the run
    * (ref psweep.py:421-438: commit message "psweep: auto commit"). */
  def enter(cwd: String, autoCommit: Boolean = true): Unit = {
    if (!isRepo(cwd)) return
    if (dirty(cwd)) {
      require(autoCommit, s"git work tree dirty in $cwd and autoCommit=false")
      git(cwd, "add", "-A")
      git(cwd, "commit", "-m", "graft: auto commit")
      ()
    }
  }

  def noteRun(runId: String): Unit = { lastRunId = Some(runId) }

  /** Commit run outputs after the sweep (ref psweep.py:441-446: message
    * contains the run id). */
  def exit(cwd: String): Unit = {
    if (!isRepo(cwd)) return
    if (dirty(cwd)) {
      git(cwd, "add", "-A")
      val id = lastRunId.getOrElse("unknown")
      git(cwd, "commit", "-m", s"graft: run_id=$id")
      ()
    }
  }
}
