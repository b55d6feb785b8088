package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for operator specs: one session per suite,
  * small shuffle fan-out so tiny-frame tests don't pay 200-task overhead.
  */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    // Fresh warehouse per JVM: managed-table locations left by a previous
    // test run are invisible to this JVM's catalog, so DROP DATABASE can't
    // clean them and CREATE fails with LOCATION_ALREADY_EXISTS.
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_spec_warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    // Session is shared across suites in one JVM (sbt forks once per run);
    // do NOT stop it here or later suites fail.
    super.afterAll()
  }

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
}
