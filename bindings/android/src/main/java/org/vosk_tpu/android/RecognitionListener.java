// Callback surface for the Android speech services.  API parity with the
// reference org.vosk.android.RecognitionListener
// (/root/reference/android/lib/src/main/java/org/vosk/android/
//  RecognitionListener.java:20-46); original implementation for the
// vosk_tpu runtime.
package org.vosk_tpu.android;

public interface RecognitionListener {
    /** Partial hypothesis while audio is still streaming in. */
    void onPartialResult(String hypothesis);

    /** Finalized segment result after an endpoint (silence). */
    void onResult(String hypothesis);

    /** Final result after the stream ends; the service stops after this. */
    void onFinalResult(String hypothesis);

    /** Unrecoverable error; the service has stopped. */
    void onError(Exception exception);

    /** The configured listening timeout elapsed. */
    void onTimeout();
}
