package graft.ops

import org.apache.parquet.crypto.KeyAccessDeniedException
import org.apache.parquet.crypto.keytools.LocalWrapKmsClient

/** Minimal KMS client for parquet modular encryption (the
  * `source_parquet_encrypted` operator): master keys come from the Hadoop
  * conf property `graft.encryption.key.list` as comma-separated
  * `keyId:base64` entries — the standard test-KMS shape re-expressed so
  * the engine carries no test-only jar. LOCAL WRAPPING mode: the
  * superclass AES-wraps each file's data/footer keys with the master key;
  * this class only resolves master-key bytes, and denies (fails CLOSED)
  * any key id absent from the conf. A production deployment swaps this
  * one class for a real KMS-backed client; every other line of the
  * operator is unchanged.
  *
  * Instances are cached by parquet's KeyToolkit per (instance id, access
  * token), so a re-keyed conf must change the token to take effect — the
  * operator's denial probe does exactly that.
  */
class ConfKms extends LocalWrapKmsClient {
  private var keys: Map[String, Array[Byte]] = Map.empty

  override protected def initializeInternal(): Unit = {
    keys = Option(hadoopConfiguration.getTrimmedStrings("graft.encryption.key.list"))
      .getOrElse(Array.empty[String])
      .flatMap { e =>
        e.split(":", 2) match {
          case Array(id, b64) => Some(id -> java.util.Base64.getDecoder.decode(b64))
          case _ => None
        }
      }.toMap
  }

  override protected def getMasterKeyFromServer(masterKeyIdentifier: String): Array[Byte] =
    keys.getOrElse(masterKeyIdentifier,
      throw new KeyAccessDeniedException(masterKeyIdentifier))
}
