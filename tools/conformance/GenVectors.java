// External-origin codec conformance vector generator.
//
// Uses the JDK's own, fully independent codec implementations
// (javax.imageio for PNG/JPEG/GIF/TIFF, javax.sound.sampled for
// WAV/G.711) to produce small payloads with deterministic pixel /
// sample patterns. The hex dumps land in tests/fixtures/
// imageio_vectors.py (via tools/conformance/generate.sh) and
// tests/test_conformance_vectors.py pins the pure-Python decoders in
// kafka_streams_and_ktable_example_spark/operators/ against them — so codec correctness no
// longer rests on self-roundtrips alone.
//
// Patterns are closed-form in (x, y) so the Python tests can recompute
// the EXPECTED pixels without trusting this file; for lossy JPEG the
// manifest also carries ImageIO's own decoded readback for a
// decoder-vs-decoder comparison.

import java.awt.image.BufferedImage;
import java.io.ByteArrayInputStream;
import java.io.ByteArrayOutputStream;
import java.io.File;
import java.io.FileWriter;
import java.io.PrintWriter;
import java.util.Iterator;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.MemoryCacheImageOutputStream;
import javax.sound.sampled.AudioFileFormat;
import javax.sound.sampled.AudioFormat;
import javax.sound.sampled.AudioInputStream;
import javax.sound.sampled.AudioSystem;

public class GenVectors {
    static PrintWriter out;

    static String hex(byte[] b) {
        StringBuilder sb = new StringBuilder(b.length * 2);
        for (byte x : b) sb.append(String.format("%02x", x));
        return sb.toString();
    }

    static void emit(String name, byte[] payload) {
        out.println(name + "\t" + hex(payload));
    }

    static int grayAt(int x, int y) { return (x * 37 + y * 101 + 7) % 256; }
    static int rAt(int x, int y) { return (x * 53 + y * 11) % 256; }
    static int gAt(int x, int y) { return (x * 19 + y * 71 + 3) % 256; }
    static int bAt(int x, int y) { return (x * 5 + y * 29 + 90) % 256; }
    // smooth gradients for the lossy JPEG vectors (keeps decoder-to-
    // decoder differences from chroma upsampling small)
    static int jGray(int x, int y) { return Math.min(255, 16 + x * 9 + y * 5); }
    static int jR(int x, int y) { return Math.min(255, 10 + x * 8 + y * 3); }
    static int jG(int x, int y) { return Math.min(255, 40 + x * 2 + y * 9); }
    static int jB(int x, int y) { return Math.min(255, 90 + x * 5 + y * 4); }

    static BufferedImage grayImage(int w, int h, boolean jpegPattern) {
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int v = jpegPattern ? jGray(x, y) : grayAt(x, y);
                img.getRaster().setSample(x, y, 0, v);
            }
        return img;
    }

    static BufferedImage rgbImage(int w, int h, boolean jpegPattern) {
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int r = jpegPattern ? jR(x, y) : rAt(x, y);
                int g = jpegPattern ? jG(x, y) : gAt(x, y);
                int b = jpegPattern ? jB(x, y) : bAt(x, y);
                img.setRGB(x, y, (r << 16) | (g << 8) | b);
            }
        return img;
    }

    static byte[] writeWith(String format, BufferedImage img,
                            boolean progressive, float quality,
                            String compression) throws Exception {
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName(format);
        ImageWriter w = it.next();
        ImageWriteParam p = w.getDefaultWriteParam();
        if (progressive) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
        if (quality >= 0) {
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionQuality(quality);
        }
        if ("None".equals(compression)) {
            p.setCompressionMode(ImageWriteParam.MODE_DISABLED);
        } else if (compression != null) {
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionType(compression);
        }
        ByteArrayOutputStream bos = new ByteArrayOutputStream();
        MemoryCacheImageOutputStream mos = new MemoryCacheImageOutputStream(bos);
        w.setOutput(mos);
        w.write(null, new IIOImage(img, null, null), p);
        mos.flush();
        w.dispose();
        return bos.toByteArray();
    }

    // ImageIO's own decode of a payload → raw gray or interleaved RGB
    static byte[] readbackGray(byte[] payload) throws Exception {
        BufferedImage img = ImageIO.read(new ByteArrayInputStream(payload));
        int w = img.getWidth(), h = img.getHeight();
        byte[] outb = new byte[w * h];
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                outb[y * w + x] = (byte) img.getRaster().getSample(x, y, 0);
        return outb;
    }

    static byte[] readbackRGB(byte[] payload) throws Exception {
        BufferedImage img = ImageIO.read(new ByteArrayInputStream(payload));
        int w = img.getWidth(), h = img.getHeight();
        byte[] outb = new byte[w * h * 3];
        int k = 0;
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int rgb = img.getRGB(x, y);
                outb[k++] = (byte) ((rgb >> 16) & 0xff);
                outb[k++] = (byte) ((rgb >> 8) & 0xff);
                outb[k++] = (byte) (rgb & 0xff);
            }
        return outb;
    }

    static short[] pcmPattern(int n) {
        short[] s = new short[n];
        for (int i = 0; i < n; i++) {
            // full-range sweep incl. extremes, closed-form (no RNG)
            long v = (i * 2731L - 32768L + (i % 7) * 4001L) % 65536L;
            if (v < -32768) v += 65536;
            if (v > 32767) v -= 65536;
            s[i] = (short) v;
        }
        return s;
    }

    public static void main(String[] args) throws Exception {
        File dir = new File(args[0]);
        dir.mkdirs();
        out = new PrintWriter(new FileWriter(new File(dir, "manifest.tsv")));

        // ---- PNG (lossless: pixels recomputable from the formula) ----
        emit("png_gray_8x5", writeWith("png", grayImage(8, 5, false), false, -1, null));
        emit("png_rgb_7x4", writeWith("png", rgbImage(7, 4, false), false, -1, null));

        // ---- JPEG baseline + progressive, gray + color ----
        byte[] jgb = writeWith("jpeg", grayImage(16, 16, true), false, 0.9f, null);
        emit("jpeg_gray_baseline_16x16", jgb);
        emit("jpeg_gray_baseline_16x16.readback", readbackGray(jgb));
        byte[] jgp = writeWith("jpeg", grayImage(16, 16, true), true, 0.9f, null);
        emit("jpeg_gray_progressive_16x16", jgp);
        emit("jpeg_gray_progressive_16x16.readback", readbackGray(jgp));
        byte[] jcb = writeWith("jpeg", rgbImage(16, 16, true), false, 0.9f, null);
        emit("jpeg_rgb_baseline_16x16", jcb);
        emit("jpeg_rgb_baseline_16x16.readback", readbackRGB(jcb));
        byte[] jcp = writeWith("jpeg", rgbImage(16, 16, true), true, 0.9f, null);
        emit("jpeg_rgb_progressive_16x16", jcp);
        emit("jpeg_rgb_progressive_16x16.readback", readbackRGB(jcp));

        // ---- GIF (indexed via ImageIO's own quantization of RGB) ----
        // 4 flat 2x2 quadrants so the palette is exactly 4 colors
        BufferedImage gimg = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB);
        int[][] quad = {{255, 0, 0}, {0, 255, 0}, {0, 0, 255}, {255, 255, 0}};
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++) {
                int[] c = quad[(y / 2) * 2 + (x / 2)];
                gimg.setRGB(x, y, (c[0] << 16) | (c[1] << 8) | c[2]);
            }
        byte[] gif = writeWith("gif", gimg, false, -1, null);
        emit("gif_quadrants_4x4", gif);
        emit("gif_quadrants_4x4.readback", readbackRGB(gif));

        // ---- TIFF: gray uncompressed + gray PackBits + RGB PackBits ----
        byte[] tg = writeWith("tiff", grayImage(9, 5, false), false, -1, "None");
        emit("tiff_gray_none_9x5", tg);
        byte[] tgp = writeWith("tiff", grayImage(9, 5, false), false, -1, "PackBits");
        emit("tiff_gray_packbits_9x5", tgp);
        byte[] trp = writeWith("tiff", rgbImage(7, 4, false), false, -1, "PackBits");
        emit("tiff_rgb_packbits_7x4", trp);

        // ---- WAV PCM16 container written by javax.sound ----
        short[] pcm = pcmPattern(64);
        byte[] pcmBytes = new byte[pcm.length * 2];
        for (int i = 0; i < pcm.length; i++) {
            pcmBytes[2 * i] = (byte) (pcm[i] & 0xff);
            pcmBytes[2 * i + 1] = (byte) ((pcm[i] >> 8) & 0xff);
        }
        AudioFormat pcmFmt = new AudioFormat(8000f, 16, 1, true, false);
        AudioInputStream pcmStream = new AudioInputStream(
            new ByteArrayInputStream(pcmBytes), pcmFmt, pcm.length);
        ByteArrayOutputStream wavOut = new ByteArrayOutputStream();
        AudioSystem.write(pcmStream, AudioFileFormat.Type.WAVE, wavOut);
        emit("wav_pcm16_mono_64", wavOut.toByteArray());

        // ---- G.711 A-law / mu-law via the JDK's converters ----
        AudioFormat alawFmt = new AudioFormat(
            AudioFormat.Encoding.ALAW, 8000f, 8, 1, 1, 8000f, false);
        AudioInputStream alaw = AudioSystem.getAudioInputStream(
            alawFmt, new AudioInputStream(
                new ByteArrayInputStream(pcmBytes), pcmFmt, pcm.length));
        emit("alaw_of_pcm64", alaw.readAllBytes());
        AudioFormat ulawFmt = new AudioFormat(
            AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false);
        AudioInputStream ulaw = AudioSystem.getAudioInputStream(
            ulawFmt, new AudioInputStream(
                new ByteArrayInputStream(pcmBytes), pcmFmt, pcm.length));
        emit("ulaw_of_pcm64", ulaw.readAllBytes());

        out.close();
        System.out.println("wrote " + new File(dir, "manifest.tsv"));
    }
}
