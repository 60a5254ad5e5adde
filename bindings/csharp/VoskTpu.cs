// C# binding over libvosk_tpu.so via P/Invoke (see ../README.md for
// status).  API shape mirrors the reference csharp package.
using System;
using System.Runtime.InteropServices;

namespace VoskTpu
{
    internal static class Native
    {
        private const string Lib = "vosk_tpu";

        [DllImport(Lib)] internal static extern void vosk_set_log_level(int level);

        [DllImport(Lib)] internal static extern IntPtr vosk_model_new(string path);
        [DllImport(Lib)] internal static extern void vosk_model_free(IntPtr model);
        [DllImport(Lib)] internal static extern int vosk_model_find_word(IntPtr model, string word);

        [DllImport(Lib)] internal static extern IntPtr vosk_spk_model_new(string path);
        [DllImport(Lib)] internal static extern void vosk_spk_model_free(IntPtr model);

        [DllImport(Lib)] internal static extern IntPtr vosk_recognizer_new(IntPtr model, float sampleRate);
        [DllImport(Lib)] internal static extern IntPtr vosk_recognizer_new_grm(IntPtr model, float sampleRate, string grammar);
        [DllImport(Lib)] internal static extern IntPtr vosk_recognizer_new_spk(IntPtr model, float sampleRate, IntPtr spk);
        [DllImport(Lib)] internal static extern void vosk_recognizer_set_spk_model(IntPtr rec, IntPtr spk);
        [DllImport(Lib)] internal static extern void vosk_recognizer_set_max_alternatives(IntPtr rec, int n);
        [DllImport(Lib)] internal static extern void vosk_recognizer_set_words(IntPtr rec, int v);
        [DllImport(Lib)] internal static extern void vosk_recognizer_set_partial_words(IntPtr rec, int v);
        [DllImport(Lib)] internal static extern void vosk_recognizer_set_word_times(IntPtr rec, int v);
        [DllImport(Lib)] internal static extern void vosk_recognizer_set_nlsml(IntPtr rec, int v);
        [DllImport(Lib)] internal static extern int vosk_recognizer_accept_waveform(IntPtr rec, byte[] data, int length);
        [DllImport(Lib)] internal static extern IntPtr vosk_recognizer_result(IntPtr rec);
        [DllImport(Lib)] internal static extern IntPtr vosk_recognizer_partial_result(IntPtr rec);
        [DllImport(Lib)] internal static extern IntPtr vosk_recognizer_final_result(IntPtr rec);
        [DllImport(Lib)] internal static extern void vosk_recognizer_reset(IntPtr rec);
        [DllImport(Lib)] internal static extern void vosk_recognizer_free(IntPtr rec);

        internal static string Str(IntPtr p) => Marshal.PtrToStringUTF8(p) ?? "";
    }

    public sealed class Model : IDisposable
    {
        internal IntPtr Handle;

        public Model(string path)
        {
            Handle = Native.vosk_model_new(path);
            if (Handle == IntPtr.Zero) throw new InvalidOperationException($"Failed to load model {path}");
        }

        public int FindWord(string word) => Native.vosk_model_find_word(Handle, word);
        public void Dispose() => Native.vosk_model_free(Handle);
    }

    public sealed class SpkModel : IDisposable
    {
        internal IntPtr Handle;

        public SpkModel(string path)
        {
            Handle = Native.vosk_spk_model_new(path);
            if (Handle == IntPtr.Zero) throw new InvalidOperationException($"Failed to load spk model {path}");
        }

        public void Dispose() => Native.vosk_spk_model_free(Handle);
    }

    public sealed class Recognizer : IDisposable
    {
        private readonly IntPtr _h;

        public Recognizer(Model model, float sampleRate)
        {
            _h = Native.vosk_recognizer_new(model.Handle, sampleRate);
            if (_h == IntPtr.Zero) throw new InvalidOperationException("Failed to create recognizer");
        }

        public Recognizer(Model model, float sampleRate, string grammarJson)
        {
            _h = Native.vosk_recognizer_new_grm(model.Handle, sampleRate, grammarJson);
            if (_h == IntPtr.Zero) throw new InvalidOperationException("Failed to create recognizer");
        }

        public void SetMaxAlternatives(int n) => Native.vosk_recognizer_set_max_alternatives(_h, n);
        public void SetWords(bool v) => Native.vosk_recognizer_set_words(_h, v ? 1 : 0);
        public void SetPartialWords(bool v) => Native.vosk_recognizer_set_partial_words(_h, v ? 1 : 0);
        public void SetWordTimes(bool v) => Native.vosk_recognizer_set_word_times(_h, v ? 1 : 0);
        public void SetSpkModel(SpkModel spk) => Native.vosk_recognizer_set_spk_model(_h, spk.Handle);

        /// <summary>Feeds s16le PCM; returns true on endpoint.</summary>
        public bool AcceptWaveform(byte[] data, int length)
        {
            int r = Native.vosk_recognizer_accept_waveform(_h, data, length);
            if (r < 0) throw new InvalidOperationException("AcceptWaveform failed");
            return r == 1;
        }

        public string Result() => Native.Str(Native.vosk_recognizer_result(_h));
        public string PartialResult() => Native.Str(Native.vosk_recognizer_partial_result(_h));
        public string FinalResult() => Native.Str(Native.vosk_recognizer_final_result(_h));
        public void Reset() => Native.vosk_recognizer_reset(_h);
        public void Dispose() => Native.vosk_recognizer_free(_h);
    }
}
