package graft.tools

/** Single-threaded microbench for the codec hot loops behind the
  * H.264 gate family (35 gates, ~50 s of the sf0.1 suite): attributes
  * per-id wall between stream SYNTHESIS, pixel DECODE, and (for the
  * deblock gate) the in-gate audit, so decoder optimization targets
  * the measured stage instead of guesses. No Spark session — these
  * are pure JVM loops, exactly what each task runs per row.
  *
  * Usage: runMain graft.tools.CodecBench [nIds]
  */
object CodecBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(300)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[codecbench] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n ids)")
    }
    val ids = (0 until n).map(i => 1L + 4 * i) // the doc_id % 4 === 1 stream

    // warmup (JIT)
    ids.take(50).foreach { id =>
      val st = graft.operators.H264.synthesizeH264Inter(2, 1, 8, id)
      graft.operators.H264.decodeInter(st)
    }

    var sink = 0L
    val streams = new scala.collection.mutable.ArrayBuffer[Array[Byte]](n)
    time("synthesizeH264Inter(mbW=2..4, 8f)") {
      ids.foreach { id =>
        val mbW = 2 + (id % 3).toInt; val mbH = 1 + (id % 3).toInt
        val st = graft.operators.H264.synthesizeH264Inter(mbW, mbH, 8, id)
        streams += st; sink += st.length
      }
    }
    time("decodeInter over those streams") {
      streams.foreach { st =>
        graft.operators.H264.decodeInter(st).foreach(f => sink += f.lumaSum)
      }
    }
    val resid = new scala.collection.mutable.ArrayBuffer[Array[Byte]](n)
    time("synthesizeH264InterResidual(2..4, 2..3f)") {
      ids.foreach { id =>
        val mbW = 2 + (id % 3).toInt; val mbH = 1 + (id % 3).toInt
        val nf = 2 + (id % 2).toInt
        val st = graft.operators.H264.synthesizeH264InterResidual(mbW, mbH, nf, id)
        resid += st; sink += st.length
      }
    }
    time("decodeInter(residual streams)") {
      resid.foreach { st =>
        graft.operators.H264.decodeInter(st).foreach(f => sink += f.lumaSum)
      }
    }
    val th = graft.operators.Deblock.DeblockThresholds(20, 6, 3)
    time("decodeInter + auditedDeblock(+chroma) (q183 shape)") {
      resid.foreach { st =>
        graft.operators.H264.decodeInter(st, fs => {
          val (hist, _) = graft.operators.Deblock.auditedDeblock(fs, th)
          graft.operators.Deblock.auditedDeblockChroma(fs, th)
          sink += hist(0)
        })
      }
    }
    // parallel variant: same work fanned over T threads — measures
    // in-JVM scaling of the decode (allocator/GC contention shows up
    // as wall >> single-thread/T)
    val tcount = args.drop(1).headOption.map(_.toInt).getOrElse(0)
    if (tcount > 0) {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      time(s"q183 shape x$tcount threads (same $n ids each? no - split)") {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(tcount)
        val futures = (0 until tcount).map { t =>
          pool.submit(new Runnable {
            def run(): Unit = {
              var i = t
              while (i < resid.length) {
                graft.operators.H264.decodeInter(resid(i), fs => {
                  val (hist, _) = graft.operators.Deblock.auditedDeblock(fs, th)
                  graft.operators.Deblock.auditedDeblockChroma(fs, th)
                  acc.addAndGet(hist(0)); ()
                })
                i += tcount
              }
            }
          })
        }
        // shutdown in finally: a failed worker future must not leave
        // non-daemon pool threads alive (the JVM would never exit)
        try futures.foreach(_.get()) finally pool.shutdown()
      }
      sink += acc.get()
    }
    val intra = new scala.collection.mutable.ArrayBuffer[Array[Byte]](n)
    time("synthesizeH264I16x16-family (q191 shape)") {
      ids.foreach { id =>
        val mbH = 1 + (id % 3).toInt
        val st = graft.operators.H264.synthesizeH264ChromaDc(mbH, 1 + (id % 2).toInt, id)
        intra += st; sink += st.length
      }
    }
    time("decodeCavlcIntra(chromaDc streams)") {
      intra.foreach { st =>
        graft.operators.H264.decodeCavlcIntra(st).foreach(f => sink += f.lumaSum)
      }
    }
    println(s"[codecbench] sink=$sink")
  }
}
