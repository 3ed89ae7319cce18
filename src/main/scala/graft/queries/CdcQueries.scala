package graft.queries

import graft.QueryDef
import graft.cdc._
import org.apache.spark.sql.functions._

/** CDC surface C1–C6 (reference parity) as driver-contract entries.
  * Input is the deterministic synthetic binlog fixture (FIXTURES.md §2
  * dialect) materialized to tmp — there is no SQL oracle for binlog
  * parsing, so these record rows-only checks; byte-level goldens live
  * in the ScalaTest specs (CdcJobSpec).
  *
  * Fixture size scales with the requested SF dir so the bench run
  * (sf0.1) measures the BASELINE.md §1 workload: 100k events, 1:1:1
  * insert/update/delete on a 3-column PK table.
  */
object CdcQueries {

  /** Rotated-binlog fixture: bench (sf0.1) = 100k events over 8 files
    * (8 parse tasks — files are the parallelism unit); t-gates = 10k
    * over 4. */
  private def fixturePath(dir: String): String =
    if (dir.contains("0.1")) BinlogFixture.materializeDir("dml_100k", 8, 12500)
    else BinlogFixture.materializeDir("dml_10k", 4, 2500)

  val defs: Seq[QueryDef] = Seq(

    QueryDef.noOracle("c1_parse_counts") { (s, d) =>
      CdcJob.parse(s, fixturePath(d))
        .groupBy("db", "table", "op")
        .agg(count(lit(1)).as("c"))
        .orderBy("db", "table", "op")
    },

    QueryDef.noOracle("c2_forward_sql") { (s, d) =>
      CdcJob.run(s, fixturePath(d), Catalog.fixture(s), CdcConfig())
    },

    QueryDef.noOracle("c3_flashback_sql") { (s, d) =>
      CdcJob.run(s, fixturePath(d), Catalog.fixture(s),
        CdcConfig(flashback = true))
    },

    QueryDef.noOracle("c6_ddl_passthrough") { (s, d) =>
      val p = BinlogFixture.materialize("repr", BinlogFixture.representative)
      CdcJob.run(s, p, Catalog.fixture(s), CdcConfig(includeDdl = true))
    }
  )
}
