// Swift wrapper over the vosk_tpu C ABI.  Role parity with the reference
// iOS wrapper (/root/reference/ios/VoskApiTest/Vosk.swift:12-54,
// VoskModel.swift:11-36): a Model loaded from the app bundle and a
// recognize call over AVAudioPCMBuffer frames.  Original implementation
// for the vosk_tpu runtime; bridge via bindings/ios/bridging.h.
//
// Deployment note: like the Android services, the expected mobile
// topology streams audio to a vosk_tpu websocket server; this on-device
// wrapper exists for API-compatibility testing against libvosk_tpu.

import AVFoundation
import Foundation

public final class VoskTpuModel {
    let handle: OpaquePointer

    /// Load a model directory shipped in the app bundle.
    public init?(bundleResource name: String) {
        guard let path = Bundle.main.resourcePath.map({ "\($0)/\(name)" })
        else { return nil }
        guard let h = vosk_model_new(path) else { return nil }
        handle = h
    }

    public init?(path: String) {
        guard let h = vosk_model_new(path) else { return nil }
        handle = h
    }

    deinit { vosk_model_free(handle) }
}

public final class VoskTpuRecognizer {
    let handle: OpaquePointer
    public let sampleRate: Float

    public init?(model: VoskTpuModel, sampleRate: Float = 16000.0) {
        guard let h = vosk_recognizer_new(model.handle, sampleRate)
        else { return nil }
        handle = h
        self.sampleRate = sampleRate
    }

    public init?(model: VoskTpuModel, sampleRate: Float, grammar: [String]) {
        let json = (try? JSONSerialization.data(withJSONObject: grammar))
            .flatMap { String(data: $0, encoding: .utf8) } ?? "[]"
        guard let h = vosk_recognizer_new_grm(model.handle, sampleRate, json)
        else { return nil }
        handle = h
        self.sampleRate = sampleRate
    }

    deinit { vosk_recognizer_free(handle) }

    public func setWords(_ enabled: Bool) {
        vosk_recognizer_set_words(handle, enabled ? 1 : 0)
    }

    public func setMaxAlternatives(_ n: Int32) {
        vosk_recognizer_set_max_alternatives(handle, n)
    }

    /// Feed one AVAudioPCMBuffer of int16 samples; returns the partial or
    /// endpoint result JSON (the reference's Vosk.recognizeData shape).
    public func recognize(buffer: AVAudioPCMBuffer) -> String {
        guard let data = buffer.int16ChannelData?.pointee else { return "" }
        let count = Int32(buffer.frameLength) * 2
        let endpoint = data.withMemoryRebound(
            to: Int8.self, capacity: Int(count)
        ) { bytes in
            vosk_recognizer_accept_waveform(handle, bytes, count)
        }
        if endpoint == 1 {
            return String(cString: vosk_recognizer_result(handle))
        }
        return String(cString: vosk_recognizer_partial_result(handle))
    }

    public func finalResult() -> String {
        String(cString: vosk_recognizer_final_result(handle))
    }

    public func reset() { vosk_recognizer_reset(handle) }
}
