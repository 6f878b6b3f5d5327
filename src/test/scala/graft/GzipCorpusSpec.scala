package graft

import graft.operators.GzipCorpus.GzipCodec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the RFC 1952 member codec behind `mm_gzip_ingest`: exact
  * round-trip, optional-field parsing (FNAME + verified FHCRC), each
  * planted-corruption class mapping to its status, boundary survival
  * on trailer mismatches vs sync loss on header damage, and the
  * multi-member walk's cascade semantics. */
class GzipCorpusSpec extends AnyFunSuite {

  private val payload =
    "the quick brown fox jumps over the lazy dog 0123456789".getBytes("UTF-8")

  test("member round-trips exactly, with and without FNAME+FHCRC") {
    for (name <- Seq(None, Some("m42"))) {
      val m = GzipCodec.encodeMember(payload, name)
      val (st, data, next) = GzipCodec.decodeMemberAt(m, 0)
      assert(st == "ok", s"name=$name")
      assert(java.util.Arrays.equals(data, payload))
      assert(next == m.length, "decode must consume exactly the member")
    }
  }

  test("JDK GZIPInputStream accepts our encoding (interop witness)") {
    val m = GzipCodec.encodeMember(payload, Some("x"))
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(m))
    val got = in.readAllBytes()
    assert(java.util.Arrays.equals(got, payload))
  }

  test("stored-CRC flip -> crc_mismatch with a SURVIVING boundary") {
    val m = GzipCodec.encodeMember(payload)
    m(m.length - 8) = (m(m.length - 8) ^ 0x01).toByte
    val (st, data, next) = GzipCodec.decodeMemberAt(m, 0)
    assert(st == "crc_mismatch" && data == null)
    assert(next == m.length, "trailer damage must not lose the boundary")
  }

  test("stored-ISIZE flip -> length_mismatch with a surviving boundary") {
    val m = GzipCodec.encodeMember(payload)
    m(m.length - 4) = (m(m.length - 4) ^ 0x01).toByte
    val (st, _, next) = GzipCodec.decodeMemberAt(m, 0)
    assert(st == "length_mismatch")
    assert(next == m.length)
  }

  test("smashed magic -> bad_magic, fatal; truncated trailer -> truncated, fatal") {
    val m1 = GzipCodec.encodeMember(payload); m1(0) = 'X'.toByte
    assert(GzipCodec.decodeMemberAt(m1, 0) == (("bad_magic", null, -1)))
    val m2 = GzipCodec.encodeMember(payload).dropRight(6)
    val (st, _, next) = GzipCodec.decodeMemberAt(m2, 0)
    assert(st == "truncated" && next == -1)
  }

  test("corrupted FHCRC -> parse_error (header CRC is verified, not skipped)") {
    val m = GzipCodec.encodeMember(payload, Some("n"))
    // FHCRC is the 2 bytes after the 10-byte header + "n\0" name
    m(12) = (m(12) ^ 0x01).toByte
    val (st, _, next) = GzipCodec.decodeMemberAt(m, 0)
    assert(st == "parse_error" && next == -1)
  }

  test("multi-member walk: recoverable damage continues, sync loss cascades") {
    def member(i: Int) = GzipCodec.encodeMember(s"payload number $i".getBytes("UTF-8"))
    val m0 = member(0)
    val m1 = member(1); m1(m1.length - 8) = (m1(m1.length - 8) ^ 0x01).toByte
    val m2 = member(2)
    val m3 = member(3); m3(0) = 'X'.toByte
    val m4 = member(4)
    val blob = m0 ++ m1 ++ m2 ++ m3 ++ m4
    val walked = GzipCodec.walk(blob, 5)
    assert(walked.map(_._1) == Seq("ok", "crc_mismatch", "ok", "bad_magic"),
      "crc damage walks on; header damage stops the walk")
    assert(new String(walked(2)._2, "UTF-8") == "payload number 2")
  }
}
