package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checkable SCC structure for [[Scc.strongComponents]]; the random
  * cross-engine check lives in GraphXParitySpec. */
class SccSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.core.GraftSession.builder("4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def scc(edges: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    Scc.strongComponents(edges.toSeq.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two cycles joined by a one-way bridge stay separate SCCs") {
    // cycle A = 1→2→3→1, cycle B = 10→11→12→10, bridge 3→10 (one-way)
    val m = scc(1L -> 2L, 2L -> 3L, 3L -> 1L,
      10L -> 11L, 11L -> 12L, 12L -> 10L, 3L -> 10L)
    assert(m(1L) === 1L && m(2L) === 1L && m(3L) === 1L)
    assert(m(10L) === 10L && m(11L) === 10L && m(12L) === 10L)
  }

  test("a back edge merges the cycles into one SCC") {
    val m = scc(1L -> 2L, 2L -> 3L, 3L -> 1L,
      10L -> 11L, 11L -> 12L, 12L -> 10L, 3L -> 10L, 12L -> 1L)
    assert(m.values.toSet === Set(1L))
  }

  test("a pure DAG has only singleton SCCs, labels = own id") {
    val m = scc(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L)
    assert(m === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("chain of singletons between cycles resolves over multiple rounds") {
    // 5→6→7 chain hangs off cycle {1,2}; each chain vertex is its own SCC
    // and only one per color class finalizes per round — exercises the
    // outer-loop repetition.
    val m = scc(1L -> 2L, 2L -> 1L, 2L -> 5L, 5L -> 6L, 6L -> 7L)
    assert(m === Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 6L, 7L -> 7L))
  }
}
