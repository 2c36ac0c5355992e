package graft

/** Shared helpers for the bench/soak mains (one timing convention,
  * one definition site — seven copies had accreted).
  */
private[graft] object BenchUtil {
  def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }
}
