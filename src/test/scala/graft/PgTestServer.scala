package graft

import java.io.File
import java.nio.file.Files

import scala.sys.process._

/** Manages a throwaway PostgreSQL 15 instance for `PgLiveSpec`, mirroring
  * the role of the reference's docker-compose Postgres
  * (`reference tests/docker-compose.yml:1-21`) in an offline sandbox with
  * only the server binaries installed.
  *
  * Root-awareness: Postgres refuses to run as root, and test JVMs here run
  * as root — so every server-side command is executed as the `postgres`
  * system user via `su`, with the data directory chowned to it. On a
  * non-root account the commands run directly. If anything is missing
  * (no binaries, no postgres user, no su), [[start]] returns Left and the
  * suite cancels instead of failing.
  */
object PgTestServer {

  final case class Live(port: Int, dataRoot: File, binDir: String) {
    val host = "127.0.0.1"
    val user = "graft"
    val database = "graftdb"
    def jdbcUrl: String = s"jdbc:postgresql://$host:$port/$database"
  }

  private def findBinDir(): Option[String] =
    Seq("/usr/lib/postgresql/15/bin", "/usr/lib/postgresql/16/bin",
      "/usr/lib/postgresql/14/bin", "/usr/local/pgsql/bin")
      .find(d => new File(d, "initdb").canExecute)
      .orElse {
        // Fall back to whatever initdb is on PATH.
        scala.util.Try(Seq("sh", "-c", "command -v initdb").!!.trim)
          .toOption.filter(_.nonEmpty).map(p => new File(p).getParent)
      }

  private val isRoot = System.getProperty("user.name") == "root"

  /** Run a shell command, as the postgres user when we are root.
    * @return (exitCode, combined output) */
  private def run(cmd: String, cwd: File): (Int, String) = {
    val full =
      if (isRoot) Seq("su", "-s", "/bin/sh", "postgres", "-c", s"cd /tmp && $cmd")
      else Seq("sh", "-c", cmd)
    val out = new StringBuilder
    val logger = ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n'))
    val code = Process(full, cwd).!(logger)
    (code, out.toString)
  }

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  /** Init + start a fresh instance; Left(reason) when the environment
    * cannot host one. */
  def start(): Either[String, Live] = {
    val binDir = findBinDir().getOrElse(return Left("no PostgreSQL binaries on this host"))
    if (isRoot && run("true", new File("/tmp"))._1 != 0)
      return Left("running as root and cannot su to a postgres user")

    val root = Files.createTempDirectory("graft-pglive").toFile
    val data = new File(root, "data")
    val log = new File(root, "server.log")
    if (isRoot) {
      val chown = Seq("chown", "-R", "postgres:postgres", root.getAbsolutePath).!
      if (chown != 0) return Left("cannot chown the data dir to postgres")
    }

    val (initCode, initOut) = run(
      s"$binDir/initdb -D ${data.getAbsolutePath} --auth=trust --auth-host=trust -U graft -E UTF8",
      root)
    if (initCode != 0) return Left(s"initdb failed: ${initOut.takeRight(400)}")

    val port = freePort()
    // fsync off: throwaway test instance, keeps the suite fast.
    val opts = s"-p $port -k ${root.getAbsolutePath} -c listen_addresses=127.0.0.1 " +
      "-c fsync=off -c synchronous_commit=off"
    val (startCode, startOut) = run(
      s"$binDir/pg_ctl -D ${data.getAbsolutePath} -w -t 30 -l ${log.getAbsolutePath} " +
        s"""-o "$opts" start""",
      root)
    if (startCode != 0) return Left(s"pg_ctl start failed: ${startOut.takeRight(400)}")

    val live = Live(port, root, binDir)
    // Create the working database through our own wire client (dogfooding
    // the thing under test for DDL too).
    try {
      val sock = new graft.sources.pgwire.PgWireSocket(
        live.host, live.port, live.user, "postgres", None)
      try sock.query(s"CREATE DATABASE ${live.database}")
      finally sock.close()
      Right(live)
    } catch {
      case e: Throwable =>
        stop(live)
        Left(s"server started but wire connect failed: $e")
    }
  }

  def stop(live: Live): Unit = {
    run(s"${live.binDir}/pg_ctl -D ${new File(live.dataRoot, "data").getAbsolutePath} " +
      "-m immediate stop", live.dataRoot)
    def rm(f: File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    rm(live.dataRoot)
  }
}
