package graft.sinks

import java.io.File
import scala.sys.process._
import scala.util.control.NonFatal

/** Boots a REAL PostgreSQL server for integration specs, using the
  * `initdb`/`pg_ctl`/`postgres` binaries shipped in the image. One instance
  * per test JVM, torn down on exit. If the binaries are missing or the
  * server fails to start, `instance` is None and dependent specs cancel
  * (they `assume` on it) rather than fail.
  *
  * PostgreSQL refuses to run as root, so when the JVM is root every server
  * command is wrapped in `su postgres -c ...` and the data directory is
  * chown'd to `postgres` first.
  */
object PgHarness {

  final case class Pg(port: Int, dir: String) {
    val url = s"jdbc:postgresql://127.0.0.1:$port/postgres?user=graft"
    def connect(): java.sql.Connection =
      java.sql.DriverManager.getConnection(url)
  }

  private val isRoot = Seq("id", "-u").!!.trim == "0"

  private def pgRun(cmd: String): Int =
    if (isRoot) Process(Seq("su", "postgres", "-c", cmd), new File("/tmp")).!(ProcessLogger(_ => ()))
    else Process(Seq("bash", "-c", cmd), new File("/tmp")).!(ProcessLogger(_ => ()))

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  lazy val instance: Option[Pg] = {
    try {
      require(pgRun("initdb --version") == 0, "no initdb binary")
      Class.forName("org.postgresql.Driver")
      val dir = s"/tmp/graft-pg-${ProcessHandle.current().pid()}"
      Process(Seq("rm", "-rf", dir)).!
      new File(dir).mkdirs()
      if (isRoot) Process(Seq("chown", "-R", "postgres:postgres", dir)).!
      require(pgRun(s"initdb -D $dir/data -U graft --auth=trust -E UTF8 >$dir/initdb.log 2>&1") == 0,
        "initdb failed")
      val port = freePort()
      require(pgRun(s"pg_ctl -D $dir/data -w -o '-p $port -c listen_addresses=127.0.0.1 " +
        s"-c fsync=off -c synchronous_commit=off -k $dir' -l $dir/pg.log start") == 0,
        "pg_ctl start failed")
      val pg = Pg(port, dir)
      val c = pg.connect() // fail fast if unreachable
      c.close()
      sys.addShutdownHook {
        pgRun(s"pg_ctl -D $dir/data -m immediate stop")
        Process(Seq("rm", "-rf", dir)).!
        ()
      }
      Some(pg)
    } catch {
      case NonFatal(e) =>
        // scalastyle:off println
        println(s"[PgHarness] no live PostgreSQL for this run: ${e.getMessage}")
        // scalastyle:on
        None
    }
  }
}
