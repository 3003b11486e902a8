package graft.functions

import java.security.SecureRandom
import java.util.Base64
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
import javax.crypto.{Cipher, Mac}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level crypto (SURVEY.md §2.7 F8-F10, §2.9 U1).
  *
  * The reference encrypts columns with Python `cryptography.Fernet` via Spark
  * UDFs with a broadcast key (createKey.py:84-140) and hashes with SHA-224
  * (ccrypto.py:48-52). Fernet is a public spec: token = 0x80 version byte ||
  * 8-byte big-endian unix timestamp || 16-byte IV || AES-128-CBC(PKCS7)
  * ciphertext || HMAC-SHA256 over everything preceding, the whole thing
  * base64url-encoded; the 32-byte key (base64url) splits into signing key
  * (first 16) and encryption key (last 16). This implementation is
  * token-compatible with the Python library.
  *
  * Ciphertexts are non-deterministic (timestamp + random IV), so the UDFs are
  * marked nondeterministic to stop Catalyst from duplicating or collapsing
  * calls; correctness is asserted by round-trip + the reference's golden
  * SHA-224 digests (ccrypto.py:78-87). The key is broadcast once per job —
  * the UDF closes over a Broadcast[Array[Byte]] so executors never re-fetch.
  */
object Fernet {
  // padded url-safe base64: the Python cryptography library REJECTS unpadded
  // tokens (verified by cross-implementation round-trip)
  private val B64 = Base64.getUrlEncoder
  private val B64D = Base64.getUrlDecoder

  def generateKey(): String = {
    val k = new Array[Byte](32)
    new SecureRandom().nextBytes(k)
    Base64.getUrlEncoder.encodeToString(k) // padded, like Fernet.generate_key()
  }

  private def splitKey(key: Array[Byte]): (Array[Byte], Array[Byte]) = {
    require(key.length == 32, "Fernet key must decode to 32 bytes")
    (key.slice(0, 16), key.slice(16, 32))
  }

  def decodeKey(b64Key: String): Array[Byte] = B64D.decode(b64Key.trim)

  def encrypt(key: Array[Byte], plaintext: Array[Byte], timestampSec: Long = System.currentTimeMillis() / 1000): String = {
    val (signKey, encKey) = splitKey(key)
    val iv = new Array[Byte](16)
    new SecureRandom().nextBytes(iv)
    val cipher = Cipher.getInstance("AES/CBC/PKCS5Padding")
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(encKey, "AES"), new IvParameterSpec(iv))
    val ct = cipher.doFinal(plaintext)
    val body = java.nio.ByteBuffer.allocate(1 + 8 + 16 + ct.length)
    body.put(0x80.toByte).putLong(timestampSec).put(iv).put(ct)
    val unsigned = body.array()
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(signKey, "HmacSHA256"))
    val tag = mac.doFinal(unsigned)
    B64.encodeToString(unsigned ++ tag)
  }

  def decrypt(key: Array[Byte], token: String): Array[Byte] = {
    val (signKey, encKey) = splitKey(key)
    val raw = B64D.decode(token.trim)
    require(raw.length >= 1 + 8 + 16 + 32 && raw(0) == 0x80.toByte, "invalid Fernet token")
    val unsigned = raw.slice(0, raw.length - 32)
    val tag = raw.slice(raw.length - 32, raw.length)
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(signKey, "HmacSHA256"))
    val expect = mac.doFinal(unsigned)
    require(java.security.MessageDigest.isEqual(expect, tag), "Fernet HMAC mismatch")
    val iv = raw.slice(9, 25)
    val ct = raw.slice(25, raw.length - 32)
    val cipher = Cipher.getInstance("AES/CBC/PKCS5Padding")
    cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(encKey, "AES"), new IvParameterSpec(iv))
    cipher.doFinal(ct)
  }
}

object Crypto {

  /** F8: Fernet-encrypt a (stringified) column. Nondeterministic by nature. */
  def encryptCol(spark: SparkSession, b64Key: String): Column => Column = {
    val bc: Broadcast[Array[Byte]] = spark.sparkContext.broadcast(Fernet.decodeKey(b64Key))
    val u = udf((v: String) => if (v == null) null else Fernet.encrypt(bc.value, v.getBytes("UTF-8")))
      .asNondeterministic()
    (c: Column) => u(c.cast("string"))
  }

  /** F9: Fernet-decrypt back to string. */
  def decryptCol(spark: SparkSession, b64Key: String): Column => Column = {
    val bc: Broadcast[Array[Byte]] = spark.sparkContext.broadcast(Fernet.decodeKey(b64Key))
    val u = udf((t: String) => if (t == null) null else new String(Fernet.decrypt(bc.value, t), "UTF-8"))
    (c: Column) => u(c)
  }

  /** F10: SHA-224 hex digest of the stringified INT value — exact reference
    * semantics `hashlib.sha224(str(int(v)).encode()).hexdigest()`
    * (ccrypto.py:48-52). Uses the built-in codegen'd sha2.
    */
  def sha224OfInt(c: Column): Column = sha2(c.cast("long").cast("string"), 224)

  /** General column hash for PII pseudonymization at scale (no UDF). */
  def sha256Col(c: Column): Column = sha2(c.cast("string"), 256)
}
