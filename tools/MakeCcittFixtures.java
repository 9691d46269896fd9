// Generates CCITT-compressed bilevel TIFF fixtures with the JDK's
// built-in ImageIO TIFF plugin (JDK >= 9) as an INDEPENDENT oracle for
// karta_spark/sources/ccitt.py: the Python decoder must reproduce the
// exact pixels the JDK encoder compressed.  Alongside each .tif a .pbm
// dump of the raw pixels (P4) is written for comparison.
//
//   javac tools/MakeCcittFixtures.java -d /tmp/ccitt
//   java -cp /tmp/ccitt MakeCcittFixtures <outdir>
//
// Compression type names per the javax.imageio TIFF plugin:
//   "CCITT RLE" (tag 2), "CCITT T.4" (tag 3), "CCITT T.6" (tag 4)
import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.*;
import java.io.*;
import java.util.*;

public class MakeCcittFixtures {
    // deterministic LCG so Python can't accidentally regenerate different
    // pixels -- the .pbm dump is the ground truth either way
    static long seed = 0x5DEECE66DL;

    static int rnd(int bound) {
        seed = seed * 6364136223846793005L + 1442695040888963407L;
        return (int) ((seed >>> 33) % bound);
    }

    static BufferedImage pattern(int w, int h, int kind) {
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY);
        WritableRaster r = img.getRaster();
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int v;
                switch (kind) {
                    case 0:  // text-like: runs of black on white lines
                        v = (y % 11 < 2 && (x / (3 + (y % 7))) % 3 == 0) ? 0 : 1;
                        break;
                    case 1:  // random speckle (stresses horizontal mode)
                        v = rnd(5) == 0 ? 0 : 1;
                        break;
                    case 2:  // diagonal bands (stresses vertical modes)
                        v = ((x + 2 * y) / 9) % 2;
                        break;
                    default: // mostly-white page with a black block (pass mode)
                        v = (x > w / 3 && x < w / 2 && y > h / 4 && y < 3 * h / 4) ? 0 : 1;
                }
                r.setSample(x, y, 0, v); // 0 = black for TYPE_BYTE_BINARY
            }
        return img;
    }

    static void dumpPbm(BufferedImage img, File f) throws IOException {
        int w = img.getWidth(), h = img.getHeight();
        try (DataOutputStream o = new DataOutputStream(new FileOutputStream(f))) {
            o.writeBytes("P4\n" + w + " " + h + "\n");
            Raster r = img.getRaster();
            byte[] row = new byte[(w + 7) / 8];
            for (int y = 0; y < h; y++) {
                Arrays.fill(row, (byte) 0);
                for (int x = 0; x < w; x++)
                    if (r.getSample(x, y, 0) == 0) // black -> PBM bit 1
                        row[x >> 3] |= (byte) (0x80 >> (x & 7));
                o.write(row);
            }
        }
    }

    public static void main(String[] args) throws Exception {
        File dir = new File(args[0]);
        dir.mkdirs();
        String[] types = {"CCITT RLE", "CCITT T.4", "CCITT T.6"};
        String[] names = {"rle", "t4", "t6"};
        int[][] sizes = {{61, 40}, {128, 96}, {333, 77}};
        for (int t = 0; t < types.length; t++)
            for (int kind = 0; kind < 4; kind++) {
                int w = sizes[kind % 3][0] + kind, h = sizes[kind % 3][1];
                BufferedImage img = pattern(w, h, kind);
                String base = names[t] + "_k" + kind + "_" + w + "x" + h;
                ImageWriter writer =
                    ImageIO.getImageWritersByFormatName("tiff").next();
                ImageWriteParam p = writer.getDefaultWriteParam();
                p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
                p.setCompressionType(types[t]);
                try (ImageOutputStream ios = ImageIO.createImageOutputStream(
                        new File(dir, base + ".tif"))) {
                    writer.setOutput(ios);
                    writer.write(null, new IIOImage(img, null, null), p);
                }
                writer.dispose();
                dumpPbm(img, new File(dir, base + ".pbm"));
                System.out.println(base);
            }
    }
}
