# Ruby binding for the vosk_tpu C ABI (core/include/vosk_api.h).
#
# The reference ships only a hello-world placeholder (ruby/lib/vosk.rb);
# this is a real fiddle-based wrapper over the same symbol surface the
# other bindings use.  UNTESTED IN THE BUILD IMAGE (no ruby runtime);
# symbol names are covered by the cross-binding parity check in
# tests/test_cabi.py.
require 'fiddle'
require 'fiddle/import'

module VoskTpu
  module C
    extend Fiddle::Importer
    dlload ENV.fetch('VOSK_TPU_LIB', 'libvosk_tpu.so')
    extern 'void* vosk_model_new(const char*)'
    extern 'void vosk_model_free(void*)'
    extern 'int vosk_model_find_word(void*, const char*)'
    extern 'void* vosk_recognizer_new(void*, float)'
    extern 'void* vosk_recognizer_new_grm(void*, float, const char*)'
    extern 'int vosk_recognizer_accept_waveform(void*, const char*, int)'
    extern 'const char* vosk_recognizer_result(void*)'
    extern 'const char* vosk_recognizer_partial_result(void*)'
    extern 'const char* vosk_recognizer_final_result(void*)'
    extern 'void vosk_recognizer_reset(void*)'
    extern 'void vosk_recognizer_free(void*)'
    extern 'void vosk_recognizer_set_max_alternatives(void*, int)'
    extern 'void vosk_recognizer_set_words(void*, int)'
    extern 'void vosk_set_log_level(int)'
  end

  class Model
    attr_reader :handle
    def initialize(path)
      @handle = C.vosk_model_new(path)
      raise ArgumentError, "failed to load model #{path}" if @handle.null?
    end

    def find_word(word) = C.vosk_model_find_word(@handle, word)
    def close = C.vosk_model_free(@handle)
  end

  class Recognizer
    def initialize(model, sample_rate, grammar: nil)
      @handle = if grammar
        C.vosk_recognizer_new_grm(model.handle, sample_rate, grammar.to_s)
      else
        C.vosk_recognizer_new(model.handle, sample_rate)
      end
      raise ArgumentError, 'failed to create recognizer' if @handle.null?
    end

    def accept_waveform(pcm_bytes)
      C.vosk_recognizer_accept_waveform(@handle, pcm_bytes, pcm_bytes.bytesize) == 1
    end

    def result = C.vosk_recognizer_result(@handle).to_s
    def partial_result = C.vosk_recognizer_partial_result(@handle).to_s
    def final_result = C.vosk_recognizer_final_result(@handle).to_s
    def set_max_alternatives(n) = C.vosk_recognizer_set_max_alternatives(@handle, n)
    def set_words(on) = C.vosk_recognizer_set_words(@handle, on ? 1 : 0)
    def reset = C.vosk_recognizer_reset(@handle)
    def close = C.vosk_recognizer_free(@handle)
  end

  def self.set_log_level(level) = C.vosk_set_log_level(level)
end
