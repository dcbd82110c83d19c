package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 profiling aid (guide §1): decomposes the slowest bench
  * queries into labeled sub-steps and times each with the noop sink so
  * the optimization targets the step that actually costs, not the one
  * that looks expensive. `runMain graft.tools.ProfileR19 [substring]`.
  * Methodology matches Bench: one untimed warm-up, then median of 3.
  */
object ProfileR19 {
  private def exhaust(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.quietBoundedWindowWarning()
    val filter = args.headOption
    def want(name: String) = filter.forall(name.contains)

    def time(name: String)(body: => Unit): Unit = if (want(name)) {
      try body catch { case scala.util.control.NonFatal(_) => } // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"step":"$name","median":${ts.sorted.apply(1)}%.3f,"min":${ts.min}%.3f,"max":${ts.max}%.3f}""")
    }

    val M = graft.multimodal.Multimodal
    import graft.streaming.AdmissionPipeline
    import graft.streaming.AdmissionPipeline.Stage
    def docs = graft.sources.Sources.table(spark, dir, "documents")
    def base = docs.filter(length(col("text")) >= 1)

    // ---- m37 decomposition -------------------------------------------
    {
      import spark.implicits._
      time("m37_mix_render") {
        exhaust(M.renderAdmissionMixTable(base).toDF())
      }
      time("m37_mix_render_cp") {
        M.renderAdmissionMixTable(base).toDF().localCheckpoint().count()
      }
      val mediaCp = M.renderAdmissionMixTable(base).toDF()
        .withColumn("ts", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
        .localCheckpoint()
      time("m37_gate_only") {
        exhaust(graft.streaming.EventStreams
          .mediaDecodeGateStream(mediaCp, "doc_id", "media", "ts"))
      }
      time("m37_audio_fp_only") {
        exhaust(M.decodedAudioFingerprints(
          mediaCp.filter(col("format").startsWith("audio/"))
            .select(col("doc_id"), col("media"), col("format"))
            .as[M.MediaRow]))
      }
      time("m37_video_fp_only") {
        exhaust(M.decodedVideoFingerprints(
          mediaCp.filter(col("format").startsWith("video/avi"))
            .select(col("doc_id"), col("media"), col("format"))
            .as[M.MediaRow], stride = 2))
      }
      val audioCorpusFp = M.memoizedWavFingerprints(base, dir)
      val videoCorpusFp = M.aviMetaFingerprints(
        M.memoizedAviFrameMeta(base, dir).toDF())
      def stagesOver(): Seq[Stage] = Seq(
        Stage.verdict("decode", "doc_id") { df =>
          graft.streaming.EventStreams
            .mediaDecodeGateStream(df, "doc_id", "media", "ts")
            .select(col("new_id").as("doc_id"), col("admit"), col("reason"))
        },
        Stage.verdict("audio_dup", "doc_id") { df =>
          val flagged = M.audioFpProbe(
              M.decodedAudioFingerprints(
                df.filter(col("format").startsWith("audio/"))
                  .select(col("doc_id"), col("media"), col("format"))
                  .as[M.MediaRow]),
              audioCorpusFp, maxDevBp = 700L)
            .select(col("new_id").as("doc_id")).distinct()
            .withColumn("__dup", lit(1))
          df.select(col("doc_id")).join(flagged, Seq("doc_id"), "left")
            .select(col("doc_id"), col("__dup").isNull.as("admit"),
              when(col("__dup").isNull, lit(""))
                .otherwise(lit("duplicate audio content already in corpus"))
                .as("reason"))
        },
        Stage.verdict("video_dup", "doc_id") { df =>
          val flagged = M.videoFpProbe(
              M.decodedVideoFingerprints(
                df.filter(col("format").startsWith("video/avi"))
                  .select(col("doc_id"), col("media"), col("format"))
                  .as[M.MediaRow], stride = 2),
              videoCorpusFp)
            .select(col("new_id").as("doc_id")).distinct()
            .withColumn("__dup", lit(1))
          df.select(col("doc_id")).join(flagged, Seq("doc_id"), "left")
            .select(col("doc_id"), col("__dup").isNull.as("admit"),
              when(col("__dup").isNull, lit(""))
                .otherwise(lit("duplicate video content already in corpus"))
                .as("reason"))
        })
      time("m37_pipeline_over_cp_media") {
        exhaust(AdmissionPipeline.report(
          AdmissionPipeline.run(mediaCp, stagesOver())))
      }
      time("m37_run_only_over_cp_media") {
        exhaust(AdmissionPipeline.run(mediaCp, stagesOver()))
      }
      time("m37_full_asis") {
        exhaust(graft.SparkEntry.queries("m37_media_admission_pipeline")(spark, dir))
      }
      // report-shape A/B over ONE fixed disposition (interleaved in one
      // JVM so host weather hits both variants equally)
      if (want("m37_report_ab")) {
        val disp = AdmissionPipeline.run(
          M.admissionMediaFeatures(M.renderAdmissionMixTable(base).toDF()),
          Seq(Stage.rowLocal("decode", col("gate_admit"), col("gate_reason"))))
        def oldReport(d: DataFrame): DataFrame = {
          val g = d.groupBy(col("stage"), col("admitted"), col("reason"))
            .agg(count(lit(1)).as("n_docs"))
          val tot = g.agg(sum(col("n_docs")).as("__tot"))
          g.crossJoin(broadcast(tot))
            .withColumn("share_bp",
              expr("CAST(n_docs * 10000 DIV __tot AS BIGINT)"))
            .drop("__tot")
        }
        // warm both
        exhaust(oldReport(disp)); exhaust(AdmissionPipeline.report(disp))
        val o = scala.collection.mutable.Buffer[Double]()
        val n = scala.collection.mutable.Buffer[Double]()
        (1 to 5).foreach { _ =>
          var t0 = System.nanoTime(); exhaust(oldReport(disp))
          o += (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime(); exhaust(AdmissionPipeline.report(disp))
          n += (System.nanoTime() - t0) / 1e9
        }
        println(f"""{"step":"m37_report_ab","old_med":${o.sorted.apply(2)}%.3f,"new_med":${n.sorted.apply(2)}%.3f,"old":[${o.map(v => f"$v%.3f").mkString(",")}],"new":[${n.map(v => f"$v%.3f").mkString(",")}]}""")
      }
    }

    // ---- m35 delta-render spread A/B (ADVICE r18): the %10==7 delta is
    // proportional to the corpus — does spreading its AVI render pay at
    // bench SF now that renderInput is guarded? Interleaved, one JVM.
    if (want("m35_spread_ab")) {
      val b = base
      def plan(spread: Boolean) = {
        val corpusFp = M.aviMetaFingerprints(M.memoizedAviFrameMeta(b, dir).toDF())
        import spark.implicits._
        val delta = M.renderAviTable(
            b.filter(pmod(col("doc_id"), lit(10)) === 7), spread = spread)
          .map(r => r.copy(doc_id = r.doc_id + 500000L))
        M.videoFpProbe(M.decodedVideoFingerprints(delta, stride = 2), corpusFp)
      }
      exhaust(plan(false)); exhaust(plan(true))
      val u = scala.collection.mutable.Buffer[Double]()
      val sp = scala.collection.mutable.Buffer[Double]()
      (1 to 5).foreach { _ =>
        var t0 = System.nanoTime(); exhaust(plan(false))
        u += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); exhaust(plan(true))
        sp += (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"step":"m35_spread_ab","unspread_med":${u.sorted.apply(2)}%.3f,"spread_med":${sp.sorted.apply(2)}%.3f,"unspread":[${u.map(v => f"$v%.3f").mkString(",")}],"spread":[${sp.map(v => f"$v%.3f").mkString(",")}]}""")
    }

    // ---- p24 decomposition -------------------------------------------
    {
      time("p24_full_asis") {
        exhaust(graft.SparkEntry.queries("p24_admission_pipeline")(spark, dir))
      }
    }

    // ---- s12 decomposition -------------------------------------------
    {
      val S = graft.operators.SimilaritySearch
      time("s12_full_asis") {
        exhaust(graft.SparkEntry.queries("s12_sparse_cosine")(spark, dir))
      }
      // vecs-checkpoint A/B: current registry plan (checkpointed vecs)
      // vs the r18 shape (lazy vecs read three times), interleaved
      if (want("s12_vecs_ab")) {
        import org.apache.spark.sql.functions.{col, round, sqrt}
        def oldPlan(): DataFrame = {
          val (kept, vecs) = S.sparseCosineBase(docs, "doc_id", "text", 256, 3)
          val cand = S.sparseCosineCandidates(kept, vecs, 0.9)
          cand
            .join(vecs.select(col("id").as("a_id"), col("ks").as("aks"),
              col("vs").as("avs"), col("n2").as("a_n2")), Seq("a_id"))
            .join(vecs.select(col("id").as("b_id"), col("ks").as("bks"),
              col("vs").as("bvs"), col("n2").as("b_n2")), Seq("b_id"))
            .withColumn("dot", graft.functions.DotSortedArrays.dotSortedArrays(
              col("aks"), col("avs"), col("bks"), col("bvs")))
            .withColumn("cos", round(col("dot").cast("double") /
              (sqrt(col("a_n2").cast("double")) * sqrt(col("b_n2").cast("double"))), 4))
            .filter(col("cos") >= 0.9)
            .select(col("a_id"), col("b_id"), col("cos"))
        }
        def newPlan(): DataFrame =
          S.sparseCosinePairs(docs, "doc_id", "text",
            threshold = 0.9, maxTermDocs = 256, ngram = 3)
        exhaust(oldPlan()); exhaust(newPlan())
        val o = scala.collection.mutable.Buffer[Double]()
        val n = scala.collection.mutable.Buffer[Double]()
        (1 to 5).foreach { _ =>
          var t0 = System.nanoTime(); exhaust(oldPlan())
          o += (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime(); exhaust(newPlan())
          n += (System.nanoTime() - t0) / 1e9
        }
        println(f"""{"step":"s12_vecs_ab","old_med":${o.sorted.apply(2)}%.3f,"new_med":${n.sorted.apply(2)}%.3f,"old":[${o.map(v => f"$v%.3f").mkString(",")}],"new":[${n.map(v => f"$v%.3f").mkString(",")}]}""")
      }
      // tf-checkpoint A/B: does materializing the (id, th, tf) postings
      // before the vocab aggregate (tf feeds BOTH the df-cap census and
      // the kept join side) beat re-evaluating the corpus explode twice?
      if (want("s12_tf_ab")) {
        import org.apache.spark.sql.functions._
        def planTfCp(): DataFrame = {
          val tf = docs
            .select(col("doc_id").as("id"),
              explode(graft.functions.WordShingles
                .wordShingles(col("text"), 3, distinct = false)).as("term"))
            .select(col("id"), xxhash64(col("term")).as("th"))
            .groupBy(col("id"), col("th"))
            .agg(count(lit(1)).as("tf"))
            .localCheckpoint()
          val vocab = tf.groupBy(col("th"))
            .agg(count(lit(1)).as("df"))
            .filter(col("df") <= 256)
          val kept = tf.join(vocab, Seq("th")).localCheckpoint()
          val vecs = kept.groupBy(col("id"))
            .agg(sort_array(collect_list(struct(col("th"), col("tf")))).as("kv"),
              sum(col("tf") * col("tf")).as("n2"))
            .select(col("id"),
              transform(col("kv"), x => x.getField("th")).as("ks"),
              transform(col("kv"), x => x.getField("tf")).as("vs"),
              col("n2")).localCheckpoint()
          val cand = S.sparseCosineCandidates(kept, vecs, 0.9)
          cand
            .join(vecs.select(col("id").as("a_id"), col("ks").as("aks"),
              col("vs").as("avs"), col("n2").as("a_n2")), Seq("a_id"))
            .join(vecs.select(col("id").as("b_id"), col("ks").as("bks"),
              col("vs").as("bvs"), col("n2").as("b_n2")), Seq("b_id"))
            .withColumn("dot", graft.functions.DotSortedArrays.dotSortedArrays(
              col("aks"), col("avs"), col("bks"), col("bvs")))
            .withColumn("cos", round(col("dot").cast("double") /
              (sqrt(col("a_n2").cast("double")) * sqrt(col("b_n2").cast("double"))), 4))
            .filter(col("cos") >= 0.9)
            .select(col("a_id"), col("b_id"), col("cos"))
        }
        def planCur(): DataFrame =
          S.sparseCosinePairs(docs, "doc_id", "text",
            threshold = 0.9, maxTermDocs = 256, ngram = 3)
        exhaust(planTfCp()); exhaust(planCur())
        val o = scala.collection.mutable.Buffer[Double]()
        val n = scala.collection.mutable.Buffer[Double]()
        (1 to 5).foreach { _ =>
          var t0 = System.nanoTime(); exhaust(planCur())
          o += (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime(); exhaust(planTfCp())
          n += (System.nanoTime() - t0) / 1e9
        }
        println(f"""{"step":"s12_tf_ab","cur_med":${o.sorted.apply(2)}%.3f,"tfcp_med":${n.sorted.apply(2)}%.3f,"cur":[${o.map(v => f"$v%.3f").mkString(",")}],"tfcp":[${n.map(v => f"$v%.3f").mkString(",")}]}""")
      }
    }

    // ---- s18/s19 stream scaffolding ----------------------------------
    time("s18_full_asis") {
      exhaust(graft.SparkEntry.queries("s18_stream_index_append")(spark, dir))
    }
    time("s19_full_asis") {
      exhaust(graft.SparkEntry.queries("s19_stream_pq_append")(spark, dir))
    }

    // ---- d16 decomposition -------------------------------------------
    {
      val D = graft.operators.Dedup
      time("d16_spans_only") {
        exhaust(D.exactSubstrSpans(D.spreadToParallelism(docs), "doc_id",
          "text", k = 10, maxGramDocs = 256))
      }
      time("d16_full_asis") {
        exhaust(graft.SparkEntry.queries("d16_exact_substr_apply")(spark, dir))
      }
    }

    // ---- p16 ----------------------------------------------------------
    time("p16_full_asis") {
      exhaust(graft.SparkEntry.queries("p16_corpus_build_v3")(spark, dir))
    }

    spark.stop()
  }
}
