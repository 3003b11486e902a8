package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Crypto, Fernet}

/** Reference crypto goldens, copied verbatim from ccrypto.py:54-90
  * (FIXTURES.md B7): SHA-224 digests + encrypt/decrypt round-trips.
  * Fernet ciphertexts are non-deterministic (timestamp+IV), so round-trip
  * equality is the oracle.
  */
class CryptoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val goldenSha224 = Map(
    "3" -> "4cfc3a1811fe40afa401b25ef7fa0379f1f7c1930a04f8755d678474",
    "12" -> "3c794f0c67bd561ce841fc6a5999bf0df298a0f0ae3487efda9d0ef4",
    "26" -> "958d42a83cf840cde79922f0795fd6ac7da4d2df828edc32244bb3ba",
    "53" -> "6c905a484091b8fd5e27b0cbdb51751f6de1f15f2f0d9d1b06149e92"
  )

  test("sha224 golden digests match the reference (ccrypto.py:78-87)") {
    val df = goldenSha224.keys.toSeq.toDF("v")
    val got = df.select($"v", Crypto.sha224OfInt($"v").as("h")).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    goldenSha224.foreach { case (k, v) => assert(got(k) == v, s"sha224($k)") }
  }

  test("Fernet round-trip: ints and floats from the reference test set") {
    val key = Fernet.generateKey()
    val kb = Fernet.decodeKey(key)
    val values = Seq("30", "40", "20", "13", "9", "1000.0", "3434.34", "3433.0", "43432.0")
    values.foreach { v =>
      val tok = Fernet.encrypt(kb, v.getBytes("UTF-8"))
      assert(new String(Fernet.decrypt(kb, tok), "UTF-8") == v)
    }
  }

  test("Fernet token structure: version byte, length, url-safe base64") {
    val key = Fernet.generateKey()
    val kb = Fernet.decodeKey(key)
    val tok = Fernet.encrypt(kb, "hello".getBytes("UTF-8"))
    val raw = java.util.Base64.getUrlDecoder.decode(tok)
    assert(raw(0) == 0x80.toByte)
    assert(raw.length == 1 + 8 + 16 + 16 + 32) // "hello" pads to one AES block
  }

  test("cross-implementation golden: decrypts a token produced by Python cryptography.Fernet") {
    // generated once with cryptography==41.x: Fernet(key).encrypt(b'graft-cross-check')
    val key = "iYcYnfEU7ztI4DziB5Zjb93MK25BtMfL1UNnHgew2IU="
    val token = "gAAAAABqfBiPJZvvCpavlTdDJIUejj5Hr0OtJj9WI3iU2UmJLg5DvJmaNdqwZ3Dc3ahKH0ILjpl_Ka7FAUTsJBC1k0pugkJAsj_Qh8NTo-_pgONDW3NFrx8="
    assert(new String(Fernet.decrypt(Fernet.decodeKey(key), token), "UTF-8") == "graft-cross-check")
  }

  test("Fernet tokens are padded url-safe base64 (Python-library requirement)") {
    val kb = Fernet.decodeKey(Fernet.generateKey())
    val tok = Fernet.encrypt(kb, "x".getBytes("UTF-8"))
    assert(tok.length % 4 == 0)
  }

  test("Fernet HMAC tamper detection") {
    val kb = Fernet.decodeKey(Fernet.generateKey())
    val tok = Fernet.encrypt(kb, "hello".getBytes("UTF-8"))
    val raw = java.util.Base64.getUrlDecoder.decode(tok)
    raw(raw.length - 1) = (raw(raw.length - 1) ^ 0x01).toByte
    val bad = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(raw)
    assertThrows[IllegalArgumentException](Fernet.decrypt(kb, bad))
  }

  test("S5: key bootstrap via text-file source -> broadcast -> column UDFs (createKey.py flow)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-key").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/fernet.key"), Fernet.generateKey())
    // read key file as a 1-row DataFrame, collect to driver (createKey.py:62-84)
    val key = graft.sources.IO.readText(spark, s"$tmp/fernet.key").head().getString(0)
    val enc = Crypto.encryptCol(spark, key)
    val dec = Crypto.decryptCol(spark, key)
    val out = Seq("secret").toDF("v")
      .withColumn("e", enc(col("v")))
      .withColumn("d", dec(col("e")))
      .head()
    assert(out.getString(2) == "secret")
  }

  test("column-level encrypt/decrypt UDFs with broadcast key (createKey.py shape)") {
    val key = Fernet.generateKey()
    val enc = Crypto.encryptCol(spark, key)
    val dec = Crypto.decryptCol(spark, key)
    val df = Seq(("o1", 100L), ("o2", 200L)).toDF("order_id", "amount")
    val out = df
      .withColumn("order_id_encrypted", enc(col("order_id")))
      .withColumn("order_id_decrypted", dec(col("order_id_encrypted")))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(3)))
  }
}
