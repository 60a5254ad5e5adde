// Asset-to-storage model sync.  Role parity with the reference
// org.vosk.android.StorageService (/root/reference/android/lib/src/main/
// java/org/vosk/android/StorageService.java:42-91): unpacks a model
// directory shipped in app assets to external storage once per version
// (a UUID marker file skips re-unpacking), then invokes a callback with
// the loaded Model off the main thread.  Original implementation for the
// vosk_tpu runtime.
package org.vosk_tpu.android;

import android.content.Context;
import android.os.Handler;
import android.os.Looper;

import org.vosk_tpu.VoskTpu;

import java.io.File;
import java.io.FileOutputStream;
import java.io.IOException;
import java.io.InputStream;
import java.io.OutputStream;
import java.nio.charset.StandardCharsets;
import java.nio.file.Files;
import java.util.concurrent.Executors;

public class StorageService {

    public interface Callback<R> {
        void onComplete(R result);
    }

    /** Unpack assets/<sourcePath> to filesDir/<targetPath>, load the model
     *  there, and deliver it on the main thread. */
    public static void unpack(Context context, String sourcePath,
                              String targetPath,
                              Callback<VoskTpu.Model> completeCallback,
                              Callback<IOException> errorCallback) {
        Handler main = new Handler(Looper.getMainLooper());
        Executors.newSingleThreadExecutor().execute(() -> {
            try {
                String outDir = sync(context, sourcePath, targetPath);
                VoskTpu.Model model = new VoskTpu.Model(outDir);
                main.post(() -> completeCallback.onComplete(model));
            } catch (IOException e) {
                main.post(() -> errorCallback.onComplete(e));
            }
        });
    }

    /** Copy the asset tree unless the version marker (assets' uuid file)
     *  already matches what is on disk; returns the on-disk model path. */
    public static String sync(Context context, String sourcePath,
                              String targetPath) throws IOException {
        File target = new File(context.getExternalFilesDir(null), targetPath);
        File marker = new File(target, "uuid");
        String wantUuid = readAsset(context, sourcePath + "/uuid");
        if (marker.exists()) {
            String haveUuid = new String(
                    Files.readAllBytes(marker.toPath()), StandardCharsets.UTF_8);
            if (haveUuid.equals(wantUuid)) {
                return new File(target, new File(sourcePath).getName()).getAbsolutePath();
            }
            deleteRecursive(target);
        }
        copyAssetTree(context, sourcePath, target);
        try (OutputStream os = new FileOutputStream(marker)) {
            os.write(wantUuid.getBytes(StandardCharsets.UTF_8));
        }
        return new File(target, new File(sourcePath).getName()).getAbsolutePath();
    }

    private static String readAsset(Context context, String path)
            throws IOException {
        try (InputStream is = context.getAssets().open(path)) {
            return new String(is.readAllBytes(), StandardCharsets.UTF_8).trim();
        }
    }

    private static void copyAssetTree(Context context, String assetPath,
                                      File outRoot) throws IOException {
        String[] children = context.getAssets().list(assetPath);
        File out = new File(outRoot, new File(assetPath).getName());
        if (children == null || children.length == 0) {
            // a file
            File parent = out.getParentFile();
            if (parent != null) parent.mkdirs();
            try (InputStream is = context.getAssets().open(assetPath);
                 OutputStream os = new FileOutputStream(out)) {
                byte[] buf = new byte[64 * 1024];
                int n;
                while ((n = is.read(buf)) > 0) os.write(buf, 0, n);
            }
        } else {
            out.mkdirs();
            for (String child : children) {
                copyAssetTree(context, assetPath + "/" + child, out);
            }
        }
    }

    private static void deleteRecursive(File f) {
        File[] children = f.listFiles();
        if (children != null) {
            for (File c : children) deleteRecursive(c);
        }
        f.delete();
    }
}
