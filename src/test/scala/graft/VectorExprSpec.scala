package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions

import graft.functions.VectorOps
import graft.operators.Lsh

class VectorExprSpec extends SparkSpec {

  private def pairs() = {
    val emb = Tables.embeddings(spark, sf0001)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    a.join(b, col("ia") === col("ib") - 250) // 250 aligned pairs
  }

  test("native L2 expression is bitwise-identical to the HOF composition") {
    val df = pairs().select(
      VectorOps.l2(col("va"), col("vb")).as("hof"),
      VectorExpressions.l2(col("va"), col("vb")).as("native"))
    val bad = df.filter(col("hof") =!= col("native")).count()
    assert(bad == 0, s"$bad rows differ")
    assert(df.count() == 250)
  }

  test("native cosine expression is bitwise-identical to the HOF composition") {
    val df = pairs().select(
      VectorOps.cosine(col("va"), col("vb")).as("hof"),
      VectorExpressions.cosine(col("va"), col("vb")).as("native"))
    val bad = df.filter(col("hof") =!= col("native")).count()
    assert(bad == 0, s"$bad rows differ")
  }

  test("LshHash expression equals the broadcast-UDF hashing") {
    val emb = Tables.embeddings(spark, sf0001)
    val model = Lsh.fit(emb, tables = 8, bits = 4)
    val bc = spark.sparkContext.broadcast(model)
    val df = emb.select(
      Lsh.hashUdf(bc)(col("embedding")).as("viaUdf"),
      VectorExpressions.lshHash(col("embedding"), model).as("viaExpr"))
    val bad = df.filter(col("viaUdf") =!= col("viaExpr")).count()
    assert(bad == 0, s"$bad rows differ")
  }

  test("nearest-cells codegen matches the driver-side kernel, both eval modes") {
    val emb = Tables.embeddings(spark, sf0001).limit(50)
    val cents = graft.operators.Vectors.collectCentroids(
      Tables.embeddings(spark, sf0001), 16)
    def viaExpr(): Map[Long, Seq[Long]] = emb.select(
        col("vec_id"),
        VectorExpressions.nearestCells(col("embedding"), cents, 4).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val codegen = viaExpr()
    val driverSide = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        cents.nearestArray(r.getSeq[Float](1).toArray, 4).toSeq).toMap
    assert(codegen == driverSide)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(viaExpr() == driverSide)
    }
  }

  test("expressions survive both codegen and interpreted eval") {
    val emb = Tables.embeddings(spark, sf0001).limit(10)
    val base = emb.select(
        VectorExpressions.l2(col("embedding"), col("embedding")).as("zero"))
      .collect().map(_.getDouble(0))
    assert(base.forall(_ == 0.0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = emb.select(
          VectorExpressions.l2(col("embedding"), col("embedding")).as("zero"))
        .collect().map(_.getDouble(0))
      assert(interp.forall(_ == 0.0))
    }
  }

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = kvs.map { case (k, _) => k -> conf.getOption(k) }
    kvs.foreach { case (k, v) => conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
