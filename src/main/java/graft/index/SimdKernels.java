package graft.index;

import jdk.incubator.vector.ByteVector;
import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.IntVector;
import jdk.incubator.vector.ShortVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD float32 distance kernels via the JDK Vector API (incubator module,
 * enabled through .jvmopts / javaOptions) — the JVM equivalent of the
 * reference's hand-vectorized AVX paths (reference: source/distance.h:22-81),
 * but full-precision over the whole dimension (no 16-lane truncation quirk)
 * with a scalar tail loop. Used only for the build/ANN-search float metric;
 * the oracle-facing exact path stays scalar Double (bit-stable).
 *
 * Written in Java because scalac cannot resolve incubator modules; javac
 * (same sbt project, mixed compile) can.
 */
public final class SimdKernels {
  private static final VectorSpecies<Float> S = FloatVector.SPECIES_PREFERRED;

  private SimdKernels() {}

  public static int lanes() { return S.length(); }

  /** Squared L2 distance, float accumulation. */
  public static float sqL2(float[] a, float[] b) {
    int i = 0;
    int bound = S.loopBound(a.length);
    FloatVector acc = FloatVector.zero(S);
    for (; i < bound; i += S.length()) {
      FloatVector d = FloatVector.fromArray(S, a, i).sub(FloatVector.fromArray(S, b, i));
      acc = d.fma(d, acc);
    }
    float s = acc.reduceLanes(VectorOperators.ADD);
    for (; i < a.length; i++) { float d = a[i] - b[i]; s += d * d; }
    return s;
  }

  /** Dot product, float accumulation. */
  public static float dot(float[] a, float[] b) {
    int i = 0;
    int bound = S.loopBound(a.length);
    FloatVector acc = FloatVector.zero(S);
    for (; i < bound; i += S.length()) {
      acc = FloatVector.fromArray(S, a, i).fma(FloatVector.fromArray(S, b, i), acc);
    }
    float s = acc.reduceLanes(VectorOperators.ADD);
    for (; i < a.length; i++) { s += a[i] * b[i]; }
    return s;
  }

  /** Squared L2 against a vector stored at {@code base} inside a flat
   *  (contiguous) array — the flat-storage variant: same accumulation
   *  order as {@link #sqL2(float[], float[])}, so results are identical. */
  public static float sqL2(float[] a, float[] flat, int base) {
    int i = 0;
    int bound = S.loopBound(a.length);
    FloatVector acc = FloatVector.zero(S);
    for (; i < bound; i += S.length()) {
      FloatVector d = FloatVector.fromArray(S, a, i).sub(FloatVector.fromArray(S, flat, base + i));
      acc = d.fma(d, acc);
    }
    float s = acc.reduceLanes(VectorOperators.ADD);
    for (; i < a.length; i++) { float d = a[i] - flat[base + i]; s += d * d; }
    return s;
  }

  /** Dot product against a flat-stored vector at {@code base}. */
  public static float dot(float[] a, float[] flat, int base) {
    int i = 0;
    int bound = S.loopBound(a.length);
    FloatVector acc = FloatVector.zero(S);
    for (; i < bound; i += S.length()) {
      acc = FloatVector.fromArray(S, a, i).fma(FloatVector.fromArray(S, flat, base + i), acc);
    }
    float s = acc.reduceLanes(VectorOperators.ADD);
    for (; i < a.length; i++) { s += a[i] * flat[base + i]; }
    return s;
  }

  /** Cosine parts against a flat-stored vector at {@code base}. */
  public static void cosineParts(float[] a, float[] flat, int base, float[] out) {
    int i = 0;
    int bound = S.loopBound(a.length);
    FloatVector dot = FloatVector.zero(S);
    FloatVector na = FloatVector.zero(S);
    FloatVector nb = FloatVector.zero(S);
    for (; i < bound; i += S.length()) {
      FloatVector va = FloatVector.fromArray(S, a, i);
      FloatVector vb = FloatVector.fromArray(S, flat, base + i);
      dot = va.fma(vb, dot);
      na = va.fma(va, na);
      nb = vb.fma(vb, nb);
    }
    float d = dot.reduceLanes(VectorOperators.ADD);
    float x = na.reduceLanes(VectorOperators.ADD);
    float y = nb.reduceLanes(VectorOperators.ADD);
    for (; i < a.length; i++) {
      d += a[i] * flat[base + i]; x += a[i] * a[i]; y += flat[base + i] * flat[base + i];
    }
    out[0] = d; out[1] = x; out[2] = y;
  }

  private static final VectorSpecies<Byte> B = ByteVector.SPECIES_PREFERRED;

  /**
   * Squared L2 between unsigned-byte vectors (SQ8 storage): the exact
   * integer sum of squared differences. Integer arithmetic is associative,
   * so the SIMD result is BIT-IDENTICAL to the scalar loop — unlike the
   * float kernels, this path needs no scalar oracle twin. Per-lane int
   * accumulation overflows only past ~500k dimensions (255^2 per step);
   * callers guard with {@link #sqL2U8MaxDim()}. The cross-lane reduction
   * widens each lane to long BEFORE summing (reduceLanesToLong would sum
   * in the int domain first and overflow past ~33k dims total).
   *
   * Two widening strategies, dispatched on dimension (measured crossover
   * ~128 on AVX-512; both produce the same exact integer):
   *  - small dims: widen both inputs to SHORT (sign-extend + mask — the
   *    ZERO_EXTEND conversions trip a JDK17 mask-broadcast limitation),
   *    subtract exactly in the short domain, square via S2I parts; best
   *    ILP when the loop runs only once or twice;
   *  - large dims: fold the unsigned compare into the BYTE domain first
   *    (sign-flip makes signed order match unsigned order, so
   *    max−min = |a−b| fits an unsigned byte), then one widen+square
   *    chain instead of two — fewest ops per 64 bytes, ~1.5x over the
   *    two-sided widen at 768 d.
   */
  public static long sqL2U8(byte[] a, byte[] flat, int base) {
    return a.length < 128 ? sqL2U8Short(a, flat, base) : sqL2U8AbsDiff(a, flat, base);
  }

  private static long sqL2U8Short(byte[] a, byte[] flat, int base) {
    int i = 0;
    int bound = B.loopBound(a.length);
    IntVector acc = IntVector.zero(IntVector.SPECIES_PREFERRED);
    for (; i < bound; i += B.length()) {
      ByteVector va = ByteVector.fromArray(B, a, i);
      ByteVector vb = ByteVector.fromArray(B, flat, base + i);
      for (int sp = 0; sp < 2; sp++) {
        ShortVector sa = ((ShortVector) va.convert(VectorOperators.B2S, sp)).and((short) 0xff);
        ShortVector sb = ((ShortVector) vb.convert(VectorOperators.B2S, sp)).and((short) 0xff);
        ShortVector ds = sa.sub(sb); // exact: |d| <= 255 fits short
        for (int ip = 0; ip < 2; ip++) {
          IntVector d = (IntVector) ds.convert(VectorOperators.S2I, ip);
          acc = acc.add(d.mul(d));
        }
      }
    }
    long s = 0;
    for (int l = 0; l < acc.length(); l++) s += acc.lane(l);
    for (; i < a.length; i++) {
      int d = (a[i] & 0xff) - (flat[base + i] & 0xff);
      s += (long) (d * d);
    }
    return s;
  }

  private static long sqL2U8AbsDiff(byte[] a, byte[] flat, int base) {
    int i = 0;
    int bound = B.loopBound(a.length);
    IntVector acc = IntVector.zero(IntVector.SPECIES_PREFERRED);
    ByteVector flip = ByteVector.broadcast(B, (byte) 0x80);
    for (; i < bound; i += B.length()) {
      ByteVector va = ByteVector.fromArray(B, a, i).lanewise(VectorOperators.XOR, flip);
      ByteVector vb = ByteVector.fromArray(B, flat, base + i).lanewise(VectorOperators.XOR, flip);
      // signed order on flipped bytes == unsigned order on originals,
      // so max-min is |a-b|; its bit pattern is the unsigned difference
      ByteVector dabs = va.max(vb).sub(va.min(vb));
      for (int part = 0; part < 4; part++) {
        IntVector d = ((IntVector) dabs.convert(VectorOperators.B2I, part)).and(0xff);
        acc = acc.add(d.mul(d));
      }
    }
    long s = 0;
    for (int l = 0; l < acc.length(); l++) s += acc.lane(l);
    for (; i < a.length; i++) {
      int d = (a[i] & 0xff) - (flat[base + i] & 0xff);
      s += (long) (d * d);
    }
    return s;
  }

  /** Max dimension before per-lane int accumulation could overflow. */
  public static int sqL2U8MaxDim() {
    return (Integer.MAX_VALUE / (255 * 255)) * IntVector.SPECIES_PREFERRED.length();
  }

  /** One-pass dot + squared norms for cosine; fills out[0]=dot,
   *  out[1]=|a|^2, out[2]=|b|^2. */
  public static void cosineParts(float[] a, float[] b, float[] out) {
    int i = 0;
    int bound = S.loopBound(a.length);
    FloatVector dot = FloatVector.zero(S);
    FloatVector na = FloatVector.zero(S);
    FloatVector nb = FloatVector.zero(S);
    for (; i < bound; i += S.length()) {
      FloatVector va = FloatVector.fromArray(S, a, i);
      FloatVector vb = FloatVector.fromArray(S, b, i);
      dot = va.fma(vb, dot);
      na = va.fma(va, na);
      nb = vb.fma(vb, nb);
    }
    float d = dot.reduceLanes(VectorOperators.ADD);
    float x = na.reduceLanes(VectorOperators.ADD);
    float y = nb.reduceLanes(VectorOperators.ADD);
    for (; i < a.length; i++) {
      d += a[i] * b[i]; x += a[i] * a[i]; y += b[i] * b[i];
    }
    out[0] = d; out[1] = x; out[2] = y;
  }
}
