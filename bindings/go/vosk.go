// Package vosktpu binds the vosk_tpu C ABI via cgo (see ../README.md for
// build/test status).  API shape mirrors the reference go package.
package vosktpu

/*
#cgo LDFLAGS: -L${SRCDIR}/../../core -lvosk_tpu -Wl,-rpath,${SRCDIR}/../../core
#include <stdlib.h>
#include "../../core/include/vosk_api.h"
*/
import "C"

import (
	"errors"
	"unsafe"
)

// SetLogLevel adjusts engine verbosity (negative = quiet).
func SetLogLevel(level int) {
	C.vosk_set_log_level(C.int(level))
}

type Model struct{ h *C.VoskModel }

func NewModel(path string) (*Model, error) {
	cs := C.CString(path)
	defer C.free(unsafe.Pointer(cs))
	h := C.vosk_model_new(cs)
	if h == nil {
		return nil, errors.New("vosk_tpu: failed to load model " + path)
	}
	return &Model{h}, nil
}

func (m *Model) FindWord(word string) int {
	cs := C.CString(word)
	defer C.free(unsafe.Pointer(cs))
	return int(C.vosk_model_find_word(m.h, cs))
}

func (m *Model) Free() { C.vosk_model_free(m.h) }

type SpkModel struct{ h *C.VoskSpkModel }

func NewSpkModel(path string) (*SpkModel, error) {
	cs := C.CString(path)
	defer C.free(unsafe.Pointer(cs))
	h := C.vosk_spk_model_new(cs)
	if h == nil {
		return nil, errors.New("vosk_tpu: failed to load speaker model")
	}
	return &SpkModel{h}, nil
}

func (m *SpkModel) Free() { C.vosk_spk_model_free(m.h) }

type Recognizer struct{ h *C.VoskRecognizer }

func NewRecognizer(model *Model, sampleRate float64) (*Recognizer, error) {
	h := C.vosk_recognizer_new(model.h, C.float(sampleRate))
	if h == nil {
		return nil, errors.New("vosk_tpu: failed to create recognizer")
	}
	return &Recognizer{h}, nil
}

func NewRecognizerGrm(model *Model, sampleRate float64, grammar string) (*Recognizer, error) {
	cs := C.CString(grammar)
	defer C.free(unsafe.Pointer(cs))
	h := C.vosk_recognizer_new_grm(model.h, C.float(sampleRate), cs)
	if h == nil {
		return nil, errors.New("vosk_tpu: failed to create grammar recognizer")
	}
	return &Recognizer{h}, nil
}

func (r *Recognizer) SetMaxAlternatives(n int) {
	C.vosk_recognizer_set_max_alternatives(r.h, C.int(n))
}
func (r *Recognizer) SetWords(v bool)        { C.vosk_recognizer_set_words(r.h, cbool(v)) }
func (r *Recognizer) SetPartialWords(v bool) { C.vosk_recognizer_set_partial_words(r.h, cbool(v)) }
func (r *Recognizer) SetWordTimes(v bool)    { C.vosk_recognizer_set_word_times(r.h, cbool(v)) }
func (r *Recognizer) SetSpkModel(m *SpkModel) {
	C.vosk_recognizer_set_spk_model(r.h, m.h)
}

// AcceptWaveform feeds s16le PCM bytes; returns 1 on endpoint, 0 to
// continue, -1 on error.
func (r *Recognizer) AcceptWaveform(data []byte) int {
	if len(data) == 0 {
		return 0
	}
	return int(C.vosk_recognizer_accept_waveform(
		r.h, (*C.char)(unsafe.Pointer(&data[0])), C.int(len(data))))
}

func (r *Recognizer) Result() string        { return C.GoString(C.vosk_recognizer_result(r.h)) }
func (r *Recognizer) PartialResult() string { return C.GoString(C.vosk_recognizer_partial_result(r.h)) }
func (r *Recognizer) FinalResult() string   { return C.GoString(C.vosk_recognizer_final_result(r.h)) }
func (r *Recognizer) Reset()                { C.vosk_recognizer_reset(r.h) }
func (r *Recognizer) Free()                 { C.vosk_recognizer_free(r.h) }

func cbool(v bool) C.int {
	if v {
		return 1
	}
	return 0
}
