/* JVM-threads ceiling for the same CSR gather loop spmv_native.c measures —
 * no Spark, no serde: isolates "what the JIT can do on this box" from
 * "what Spark's per-iteration machinery costs". Run via bench/native/run_jvm.sh. */
import java.util.concurrent.*;

public class SpmvJvm {
  static long N = 1L << 22;
  static int W = 96;
  static int[] rowPtrOf(int n, int w) {
    int[] rp = new int[n + 1];
    for (int r = 0; r < n; r++) {
      long lo = r - w / 2; if (lo < 0) lo = 0;
      long hi = lo + w; if (hi > n) { hi = n; lo = hi - w; if (lo < 0) lo = 0; }
      rp[r + 1] = rp[r] + (int) (hi - lo);
    }
    return rp;
  }

  public static void main(String[] args) throws Exception {
    int n = (int) N, w = W;
    int threads = args.length > 0 ? Integer.parseInt(args[0]) : 32;
    int passes = args.length > 1 ? Integer.parseInt(args[1]) : 15;
    int[] rowPtr = rowPtrOf(n, w);
    long nnz = rowPtr[n];
    int[] colInd = new int[(int) nnz];
    float[] val = new float[(int) nnz];
    for (int r = 0; r < n; r++) {
      long lo = r - w / 2; if (lo < 0) lo = 0;
      long hi = lo + w; if (hi > n) { hi = n; lo = hi - w; if (lo < 0) lo = 0; }
      int p = rowPtr[r];
      for (long c = lo; c < hi; c++) { colInd[p] = (int) c; val[p] = 1.0f / (hi - lo); p++; }
    }
    float[] x = new float[n], y = new float[n];
    java.util.Arrays.fill(x, 1.0f / n);
    ExecutorService pool = Executors.newFixedThreadPool(threads);
    double best = 1e30, sum = 0;
    for (int pass = 0; pass < passes + 1; pass++) {
      final float[] fx = x, fy = y;
      long t0 = System.nanoTime();
      Future<?>[] fs = new Future<?>[threads];
      int chunk = (n + threads - 1) / threads;
      for (int t = 0; t < threads; t++) {
        final int r0 = t * chunk, r1 = Math.min(n, r0 + chunk);
        fs[t] = pool.submit(() -> {
          for (int r = r0; r < r1; r++) {
            float s = 0f;
            int e = rowPtr[r + 1];
            for (int j = rowPtr[r]; j < e; j++) s += val[j] * fx[colInd[j]];
            fy[r] = s;
          }
        });
      }
      for (Future<?> f : fs) f.get();
      double dt = (System.nanoTime() - t0) / 1e9;
      if (pass > 0) { if (dt < best) best = dt; sum += dt; } // drop warm pass
      float[] tmp = x; x = y; y = tmp;
    }
    pool.shutdown();
    System.out.printf("{\"shape\":\"jvm_band_222_w96\",\"threads\":%d,\"nnz\":%d," +
        "\"min_us\":%.1f,\"mean_us\":%.1f,\"edges_per_sec_min\":%.3e,\"edges_per_sec_mean\":%.3e}%n",
        threads, nnz, best * 1e6, sum / passes * 1e6, nnz / best, nnz * passes / sum);
  }
}
