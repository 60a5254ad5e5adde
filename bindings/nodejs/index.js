// Node.js binding over libvosk_tpu.so (see ../README.md for status).
// API shape matches the reference's nodejs package: Model, SpkModel,
// Recognizer with acceptWaveform/result/partialResult/finalResult.
"use strict";

const ffi = require("ffi-napi");
const path = require("path");

const libPath =
  process.env.VOSK_TPU_LIB ||
  path.join(__dirname, "..", "..", "core", "libvosk_tpu.so");

const lib = ffi.Library(libPath, {
  vosk_set_log_level: ["void", ["int"]],
  vosk_model_new: ["pointer", ["string"]],
  vosk_model_free: ["void", ["pointer"]],
  vosk_model_find_word: ["int", ["pointer", "string"]],
  vosk_spk_model_new: ["pointer", ["string"]],
  vosk_spk_model_free: ["void", ["pointer"]],
  vosk_recognizer_new: ["pointer", ["pointer", "float"]],
  vosk_recognizer_new_grm: ["pointer", ["pointer", "float", "string"]],
  vosk_recognizer_new_spk: ["pointer", ["pointer", "float", "pointer"]],
  vosk_recognizer_set_spk_model: ["void", ["pointer", "pointer"]],
  vosk_recognizer_set_max_alternatives: ["void", ["pointer", "int"]],
  vosk_recognizer_set_words: ["void", ["pointer", "int"]],
  vosk_recognizer_set_partial_words: ["void", ["pointer", "int"]],
  vosk_recognizer_set_word_times: ["void", ["pointer", "int"]],
  vosk_recognizer_set_nlsml: ["void", ["pointer", "int"]],
  vosk_recognizer_accept_waveform: ["int", ["pointer", "pointer", "int"]],
  vosk_recognizer_result: ["string", ["pointer"]],
  vosk_recognizer_partial_result: ["string", ["pointer"]],
  vosk_recognizer_final_result: ["string", ["pointer"]],
  vosk_recognizer_reset: ["void", ["pointer"]],
  vosk_recognizer_free: ["void", ["pointer"]],
});

function setLogLevel(level) {
  lib.vosk_set_log_level(level);
}

class Model {
  constructor(modelPath) {
    this.handle = lib.vosk_model_new(modelPath);
    if (this.handle.isNull()) {
      throw new Error(`Failed to load model at ${modelPath}`);
    }
  }
  findWord(word) {
    return lib.vosk_model_find_word(this.handle, word);
  }
  free() {
    lib.vosk_model_free(this.handle);
  }
}

class SpkModel {
  constructor(modelPath) {
    this.handle = lib.vosk_spk_model_new(modelPath);
    if (this.handle.isNull()) {
      throw new Error(`Failed to load speaker model at ${modelPath}`);
    }
  }
  free() {
    lib.vosk_spk_model_free(this.handle);
  }
}

class Recognizer {
  constructor(opts) {
    const { model, sampleRate, grammar, speakerModel } = opts;
    this.handle = grammar
      ? lib.vosk_recognizer_new_grm(
          model.handle, sampleRate, JSON.stringify(grammar))
      : speakerModel
        ? lib.vosk_recognizer_new_spk(
            model.handle, sampleRate, speakerModel.handle)
        : lib.vosk_recognizer_new(model.handle, sampleRate);
    if (this.handle.isNull()) {
      throw new Error("Failed to create recognizer");
    }
  }
  setMaxAlternatives(n) {
    lib.vosk_recognizer_set_max_alternatives(this.handle, n);
  }
  setWords(v) {
    lib.vosk_recognizer_set_words(this.handle, v ? 1 : 0);
  }
  setPartialWords(v) {
    lib.vosk_recognizer_set_partial_words(this.handle, v ? 1 : 0);
  }
  setWordTimes(v) {
    lib.vosk_recognizer_set_word_times(this.handle, v ? 1 : 0);
  }
  setSpkModel(spkModel) {
    lib.vosk_recognizer_set_spk_model(this.handle, spkModel.handle);
  }
  acceptWaveform(buf) {
    return lib.vosk_recognizer_accept_waveform(this.handle, buf, buf.length);
  }
  result() {
    return JSON.parse(lib.vosk_recognizer_result(this.handle));
  }
  partialResult() {
    return JSON.parse(lib.vosk_recognizer_partial_result(this.handle));
  }
  finalResult() {
    return JSON.parse(lib.vosk_recognizer_final_result(this.handle));
  }
  reset() {
    lib.vosk_recognizer_reset(this.handle);
  }
  free() {
    lib.vosk_recognizer_free(this.handle);
  }
}

module.exports = { setLogLevel, Model, SpkModel, Recognizer };
