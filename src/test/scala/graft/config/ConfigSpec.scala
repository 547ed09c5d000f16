package graft.config

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  private val sample =
    """# comment
      |[DEFAULT]
      |retention = 12 MONTH
      |base = /tmp/graft
      |
      |[archiver:os]
      |enable = true
      |src = live
      |dst = arch, files
      |delete_data = yes
      |
      |[archiver:off]
      |enable = false
      |src = live
      |dst = arch
      |
      |[src:live]
      |dir = ${base}/src
      |deleted_column = deleted_at
      |excluded_tables = shadow_.*;tmp_.*
      |
      |[dst:arch]
      |type = parquet
      |directory = ${base}/archive
      |evolve_schema = yes
      |
      |[dst:files]
      |type = csv
      |directory = ${src:live:dir}_csv_{date}
      |""".stripMargin

  test("sections, DEFAULT fallback, interpolation") {
    val ini = Ini.parse(sample)
    assert(ini.get("src:live", "retention").contains("12 MONTH")) // DEFAULT
    assert(ini.get("src:live", "dir").contains("/tmp/graft/src")) // ${base}
    assert(ini.get("dst:files", "directory").contains("/tmp/graft/src_csv_{date}")) // cross-section
    assert(ini.list("src:live", "excluded_tables") === Seq("shadow_.*", "tmp_.*"))
    assert(ini.bool("archiver:os", "delete_data"))
  }

  test("archiver factory builds enabled pipelines only") {
    val archivers = Config.archivers(Ini.parse(sample))
    assert(archivers.map(_.name) === Seq("os"))
    val a = archivers.head
    assert(a.source.dir === "/tmp/graft/src")
    assert(a.deleteData)
    assert(a.destinations.map(_.name) === Seq("arch", "files"))
    assert(a.destinations.head.isInstanceOf[ParquetDestination])
    assert(a.destinations.head.asInstanceOf[ParquetDestination].evolveSchema)
  }

  test("runtime {now}/{date} interpolation") {
    val now = Instant.parse("2026-08-12T10:30:00Z")
    assert(Config.interpolateRuntime("/a/b_{date}", now) === "/a/b_2026-08-12_10-30-00")
    assert(Config.interpolateRuntime("{now}", now) === "2026-08-12T10:30:00Z")
  }

  test("bad values raise") {
    val ini = Ini.parse("[s]\nflag = maybe\n")
    assertThrows[IllegalArgumentException](ini.bool("s", "flag"))
    assertThrows[IllegalArgumentException](Ini.parse("[s]\nnot a kv line\n"))
    assertThrows[IllegalArgumentException](
      Ini.parse("[s]\na = ${b}\nb = ${a}\n").get("s", "a")) // loop
  }
}
