package ihc;

import java.nio.charset.StandardCharsets;
import java.util.Arrays;
import java.util.HashSet;

import com.esotericsoftware.kryo.Kryo;
import com.esotericsoftware.kryo.KryoSerializable;
import com.esotericsoftware.kryo.io.Input;
import com.esotericsoftware.kryo.io.Output;

/**
 * Partial-aggregate state for {@link HashSetCountAggregator} with a
 * COMPACT WIRE FORMAT at the Serialize boundary (the reference's
 * DistHashSetSerialize, hashset-count.cc:195-262, flattens its
 * buckets into one buffer for exactly this hop).
 *
 * In memory it is a plain HashSet (O(1) reduce per row). On the wire
 * — the only place the set is ever serialized, the partial/final
 * Exchange — it front-codes the SORTED element list (the SSTable /
 * Lucene terms-block trick):
 *
 *   varint n, then per element (UTF-8 byte order):
 *     varint sharedPrefixLen(prev)  + varint suffixLen + suffix bytes
 *
 * Keys in real distinct-count workloads share long prefixes
 * (user_000123, 2024-01-01T...), so shared-prefix elimination beats
 * kryo's stock CollectionSerializer (class tag + per-element String
 * header + full bytes) on exactly the 300k-cardinality groups this
 * tier targets; sorting costs O(n log n) ONCE per partial buffer at
 * serialize time, against bytes saved on every exchange hop.
 *
 * Byte-exact for every valid Java string: prefixes compare raw UTF-8
 * bytes (embedded NUL is an ordinary byte — the trap the reference's
 * \0-terminated layout documents), and decode reconstructs the exact
 * byte sequence before re-interning as a String.
 */
public final class StringSetBuffer implements KryoSerializable {

  private HashSet<String> set = new HashSet<>();

  public void add(String s) {
    set.add(s);
  }

  public int size() {
    return set.size();
  }

  public boolean isEmpty() {
    return set.isEmpty();
  }

  /** Union {@code other} into this buffer (iterate the smaller side). */
  public StringSetBuffer union(StringSetBuffer other) {
    if (set.size() < other.set.size()) {
      other.set.addAll(set);
      set = other.set;
    } else {
      set.addAll(other.set);
    }
    return this;
  }

  private static int sharedPrefix(byte[] a, byte[] b) {
    int n = Math.min(a.length, b.length);
    int i = 0;
    while (i < n && a[i] == b[i]) {
      i++;
    }
    return i;
  }

  @Override
  public void write(Kryo kryo, Output out) {
    byte[][] arr = new byte[set.size()][];
    int i = 0;
    for (String s : set) {
      arr[i++] = s.getBytes(StandardCharsets.UTF_8);
    }
    Arrays.sort(arr, (x, y) -> {
      int n = Math.min(x.length, y.length);
      for (int k = 0; k < n; k++) {
        int c = (x[k] & 0xFF) - (y[k] & 0xFF);
        if (c != 0) {
          return c;
        }
      }
      return x.length - y.length;
    });
    out.writeVarInt(arr.length, true);
    byte[] prev = new byte[0];
    for (byte[] cur : arr) {
      int common = sharedPrefix(prev, cur);
      out.writeVarInt(common, true);
      out.writeVarInt(cur.length - common, true);
      out.writeBytes(cur, common, cur.length - common);
      prev = cur;
    }
  }

  @Override
  public void read(Kryo kryo, Input in) {
    int n = in.readVarInt(true);
    set = new HashSet<>(Math.max(16, n * 2));
    byte[] prev = new byte[0];
    for (int i = 0; i < n; i++) {
      int common = in.readVarInt(true);
      int suffix = in.readVarInt(true);
      byte[] cur = new byte[common + suffix];
      System.arraycopy(prev, 0, cur, 0, common);
      in.readBytes(cur, common, suffix);
      set.add(new String(cur, StandardCharsets.UTF_8));
      prev = cur;
    }
  }
}
