// InputStream-driven recognition service.  Role parity with the reference
// org.vosk.android.SpeechStreamService (/root/reference/android/lib/src/
// main/java/org/vosk/android/SpeechStreamService.java:30-165): pumps a
// PCM InputStream (e.g. a wav asset past its header) through a Recognizer
// on a worker thread with callbacks on the main looper.  Original
// implementation for the vosk_tpu runtime.
package org.vosk_tpu.android;

import android.os.Handler;
import android.os.Looper;

import org.vosk_tpu.VoskTpu;

import java.io.IOException;
import java.io.InputStream;

public class SpeechStreamService {

    private final VoskTpu.Recognizer recognizer;
    private final InputStream stream;
    private final int bufferSize;

    private Thread recognizerThread;
    private final Handler mainHandler = new Handler(Looper.getMainLooper());
    private volatile boolean running;

    public SpeechStreamService(VoskTpu.Recognizer recognizer,
                               InputStream stream, float sampleRate) {
        this.recognizer = recognizer;
        this.stream = stream;
        this.bufferSize = Math.round((float) sampleRate * 0.2f * 2);
    }

    public boolean start(RecognitionListener listener) {
        if (running) return false;
        running = true;
        recognizerThread = new Thread(() -> pump(listener),
                "VoskTpuSpeechStreamService");
        recognizerThread.start();
        return true;
    }

    public void stop() {
        if (!running) return;
        running = false;
        try {
            recognizerThread.join();
        } catch (InterruptedException e) {
            Thread.currentThread().interrupt();
        }
        recognizerThread = null;
    }

    private void pump(RecognitionListener listener) {
        byte[] buffer = new byte[bufferSize];
        try {
            while (running) {
                int n = stream.read(buffer, 0, buffer.length);
                if (n < 0) break; // end of stream
                if (recognizer.acceptWaveform(buffer, n)) {
                    final String r = recognizer.getResult();
                    mainHandler.post(() -> listener.onResult(r));
                } else {
                    final String p = recognizer.getPartialResult();
                    mainHandler.post(() -> listener.onPartialResult(p));
                }
            }
            final String f = recognizer.getFinalResult();
            mainHandler.post(() -> listener.onFinalResult(f));
        } catch (IOException e) {
            mainHandler.post(() -> listener.onError(e));
        } finally {
            running = false;
        }
    }
}
