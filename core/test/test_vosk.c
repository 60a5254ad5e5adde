/* C ABI smoke test — decode a WAV through libvosk_tpu, print results.
 * Mirrors the shape of the reference c/test_vosk.c. */
#include <stdio.h>
#include <stdlib.h>

#include "vosk_api.h"

int main(int argc, char **argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s <model-dir> <wav>\n", argv[0]);
    return 2;
  }
  FILE *wavin;
  char buf[3200];
  int nread, final;

  vosk_set_log_level(-1);
  VoskModel *model = vosk_model_new(argv[1]);
  if (!model) {
    fprintf(stderr, "model load failed\n");
    return 1;
  }
  if (vosk_model_find_word(model, "one") < 0) {
    fprintf(stderr, "find_word failed\n");
    return 1;
  }
  VoskRecognizer *recognizer = vosk_recognizer_new(model, 16000.0);
  if (!recognizer) {
    fprintf(stderr, "recognizer create failed\n");
    return 1;
  }
  vosk_recognizer_set_words(recognizer, 1);

  wavin = fopen(argv[2], "rb");
  if (!wavin) {
    fprintf(stderr, "cannot open %s\n", argv[2]);
    return 1;
  }
  fseek(wavin, 44, SEEK_SET);
  while (!feof(wavin)) {
    nread = (int)fread(buf, 1, sizeof(buf), wavin);
    if (nread <= 0) break;
    final = vosk_recognizer_accept_waveform(recognizer, buf, nread);
    if (final < 0) {
      fprintf(stderr, "accept_waveform error\n");
      return 1;
    }
    if (final) {
      printf("%s\n", vosk_recognizer_result(recognizer));
    } else {
      printf("%s\n", vosk_recognizer_partial_result(recognizer));
    }
  }
  printf("%s\n", vosk_recognizer_final_result(recognizer));
  fclose(wavin);

  vosk_recognizer_free(recognizer);
  vosk_model_free(model);
  return 0;
}
