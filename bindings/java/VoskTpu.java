// Java binding over libvosk_tpu.so via JNA (see ../README.md for status).
// API shape mirrors the reference java package (Model / Recognizer /
// SpkModel with AutoCloseable lifetimes).
package org.vosk_tpu;

import com.sun.jna.Library;
import com.sun.jna.Native;
import com.sun.jna.Pointer;

public final class VoskTpu {
    interface CApi extends Library {
        CApi INSTANCE = Native.load("vosk_tpu", CApi.class);

        void vosk_set_log_level(int level);

        Pointer vosk_model_new(String path);
        void vosk_model_free(Pointer model);
        int vosk_model_find_word(Pointer model, String word);

        Pointer vosk_spk_model_new(String path);
        void vosk_spk_model_free(Pointer model);

        Pointer vosk_recognizer_new(Pointer model, float sampleRate);
        Pointer vosk_recognizer_new_grm(Pointer model, float sampleRate, String grammar);
        Pointer vosk_recognizer_new_spk(Pointer model, float sampleRate, Pointer spk);
        void vosk_recognizer_set_spk_model(Pointer rec, Pointer spk);
        void vosk_recognizer_set_max_alternatives(Pointer rec, int n);
        void vosk_recognizer_set_words(Pointer rec, int v);
        void vosk_recognizer_set_partial_words(Pointer rec, int v);
        void vosk_recognizer_set_word_times(Pointer rec, int v);
        void vosk_recognizer_set_nlsml(Pointer rec, int v);
        int vosk_recognizer_accept_waveform(Pointer rec, byte[] data, int length);
        String vosk_recognizer_result(Pointer rec);
        String vosk_recognizer_partial_result(Pointer rec);
        String vosk_recognizer_final_result(Pointer rec);
        void vosk_recognizer_reset(Pointer rec);
        void vosk_recognizer_free(Pointer rec);
    }

    public static void setLogLevel(int level) {
        CApi.INSTANCE.vosk_set_log_level(level);
    }

    public static final class Model implements AutoCloseable {
        final Pointer handle;

        public Model(String path) {
            handle = CApi.INSTANCE.vosk_model_new(path);
            if (handle == null) throw new RuntimeException("Failed to load model " + path);
        }

        public int findWord(String word) {
            return CApi.INSTANCE.vosk_model_find_word(handle, word);
        }

        @Override public void close() { CApi.INSTANCE.vosk_model_free(handle); }
    }

    public static final class SpkModel implements AutoCloseable {
        final Pointer handle;

        public SpkModel(String path) {
            handle = CApi.INSTANCE.vosk_spk_model_new(path);
            if (handle == null) throw new RuntimeException("Failed to load spk model " + path);
        }

        @Override public void close() { CApi.INSTANCE.vosk_spk_model_free(handle); }
    }

    public static final class Recognizer implements AutoCloseable {
        final Pointer handle;

        public Recognizer(Model model, float sampleRate) {
            handle = CApi.INSTANCE.vosk_recognizer_new(model.handle, sampleRate);
            if (handle == null) throw new RuntimeException("Failed to create recognizer");
        }

        public Recognizer(Model model, float sampleRate, String grammarJson) {
            handle = CApi.INSTANCE.vosk_recognizer_new_grm(model.handle, sampleRate, grammarJson);
            if (handle == null) throw new RuntimeException("Failed to create recognizer");
        }

        public void setMaxAlternatives(int n) { CApi.INSTANCE.vosk_recognizer_set_max_alternatives(handle, n); }
        public void setWords(boolean v) { CApi.INSTANCE.vosk_recognizer_set_words(handle, v ? 1 : 0); }
        public void setPartialWords(boolean v) { CApi.INSTANCE.vosk_recognizer_set_partial_words(handle, v ? 1 : 0); }
        public void setWordTimes(boolean v) { CApi.INSTANCE.vosk_recognizer_set_word_times(handle, v ? 1 : 0); }
        public void setSpkModel(SpkModel spk) { CApi.INSTANCE.vosk_recognizer_set_spk_model(handle, spk.handle); }

        /** Feeds s16le PCM; returns true on endpoint. */
        public boolean acceptWaveform(byte[] data, int length) {
            int r = CApi.INSTANCE.vosk_recognizer_accept_waveform(handle, data, length);
            if (r < 0) throw new RuntimeException("acceptWaveform failed");
            return r == 1;
        }

        public String getResult() { return CApi.INSTANCE.vosk_recognizer_result(handle); }
        public String getPartialResult() { return CApi.INSTANCE.vosk_recognizer_partial_result(handle); }
        public String getFinalResult() { return CApi.INSTANCE.vosk_recognizer_final_result(handle); }
        public void reset() { CApi.INSTANCE.vosk_recognizer_reset(handle); }

        @Override public void close() { CApi.INSTANCE.vosk_recognizer_free(handle); }
    }

    private VoskTpu() {}
}
