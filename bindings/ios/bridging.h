/* Objective-C bridging header for the Swift wrapper — exposes the
 * vosk_tpu C ABI (role of /root/reference/ios/VoskApiTest/bridging.h). */
#include "../../core/include/vosk_api.h"
