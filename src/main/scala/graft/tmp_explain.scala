package graft
import org.apache.spark.sql.functions._
object TmpExplain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("explain")
    val li = Tables(spark, "/root/testdata/sf0.1", "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val c = li.filter(cols.map(col(_).isNotNull).reduce(_ && _))
    def q(x: org.apache.spark.sql.Column) = x.cast("decimal(28,8)")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"[tmp] $label%-40s runs=${ts.map(t=>f"$t%.2f").mkString(",")}")
    }
    val moments =
      Seq(count(lit(1)).as("n")) ++
        cols.map(x => sum(q(col(x))).as(s"s_$x")) ++
        cols.map(x => sum(q(col(x) * col(x))).as(s"ss_$x")) ++
        cols.combinations(2).map { case Seq(a, b) =>
          sum(q(col(a) * col(b))).as(s"sp_${a}_$b") }.toSeq
    time("moments collect (full compute)") {
      c.agg(moments.head, moments.tail: _*).collect(); ()
    }
    time("4 plain-decimal sums collect") {
      c.agg(cols.map(x => sum(q(col(x)))).head,
        cols.map(x => sum(q(col(x)))).tail: _*).collect(); ()
    }
    time("4 double sums collect") {
      c.agg(sum(col(cols(0))), sum(col(cols(1))), sum(col(cols(2))),
        sum(col(cols(3)))).collect(); ()
    }
    time("15 DOUBLE moments collect") {
      val ms = Seq(count(lit(1))) ++ cols.map(x => sum(col(x))) ++
        cols.map(x => sum(col(x) * col(x))) ++
        cols.combinations(2).map { case Seq(a, b) =>
          sum(col(a) * col(b)) }.toSeq
      c.agg(ms.head, ms.tail: _*).collect(); ()
    }
    spark.stop()
  }
}
