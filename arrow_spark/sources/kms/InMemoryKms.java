package arrowspark.kms;

import java.util.Base64;
import java.util.HashMap;
import java.util.Map;
import org.apache.parquet.crypto.KeyAccessDeniedException;
import org.apache.parquet.crypto.ParquetCryptoRuntimeException;
import org.apache.parquet.crypto.keytools.LocalWrapKmsClient;

/**
 * In-memory KMS client for Parquet modular encryption tests: master
 * keys arrive base64-encoded in the Hadoop property
 * {@code parquet.encryption.key.list} as {@code keyId:base64} entries
 * (the same contract as parquet-mr's test mock, which is not shipped
 * in the runtime jar). Extends LocalWrapKmsClient, so data-key
 * wrapping/unwrapping is parquet-mr's own local AES wrap
 * (KeyToolkit.encryptKeyLocally) - only master-key RESOLUTION is
 * in-memory. Never use outside tests: a real deployment resolves
 * master keys from an actual KMS.
 */
public class InMemoryKms extends LocalWrapKmsClient {
  public static final String KEY_LIST_PROPERTY_NAME = "parquet.encryption.key.list";

  private Map<String, byte[]> masterKeys;

  @Override
  protected void initializeInternal() throws KeyAccessDeniedException {
    masterKeys = new HashMap<>();
    String[] entries = hadoopConfiguration.getTrimmedStrings(KEY_LIST_PROPERTY_NAME);
    if (entries == null || entries.length == 0) {
      throw new ParquetCryptoRuntimeException(
          "no master keys in " + KEY_LIST_PROPERTY_NAME);
    }
    for (String entry : entries) {
      String[] parts = entry.split(":", 2);
      if (parts.length != 2) {
        throw new ParquetCryptoRuntimeException("bad key entry: " + entry);
      }
      masterKeys.put(parts[0].trim(), Base64.getDecoder().decode(parts[1].trim()));
    }
  }

  @Override
  protected byte[] getMasterKeyFromServer(String masterKeyIdentifier)
      throws KeyAccessDeniedException {
    byte[] key = masterKeys.get(masterKeyIdentifier);
    if (key == null) {
      throw new KeyAccessDeniedException("unknown master key: " + masterKeyIdentifier);
    }
    return key;
  }
}
