// Golden-output generator for the scatter_points_on parity test: runs the
// distributePointsOn algorithm (GeometryUtil.java:745-797 semantics) with
// the REAL java.util.Random on the JDK, over a rectangle-with-a-hole
// polygon where contains/intersects tests are exact comparisons. The
// engine's bit-exact LCG replica must reproduce every point.
//
// Usage: javac ScatterGolden.java && java ScatterGolden > scatter_golden.json
import java.util.Random;

public class ScatterGolden {
    static final int POINTS_PER_BOX = 100;

    public static void main(String[] args) {
        double[][] cases = {
            // seed, x0, z0, x1, z1, hx0, hz0, hx1, hz1, density
            {42, 0, 0, 130, 115, 23.7, 19.3, 55.6, 46.7, 0.04},
            {7, 10, 20, 171.3, 140.2, 40.1, 60.7, 90.4, 99.9, 0.09},
            {123456789, -50, -30, 60, 85, -10.5, 0.3, 20.2, 33.3, 0.0625},
        };
        System.out.println("[");
        for (int c = 0; c < cases.length; c++) {
            double[] p = cases[c];
            long seed = (long) p[0];
            double x0 = p[1], z0 = p[2], x1 = p[3], z1 = p[4];
            double hx0 = p[5], hz0 = p[6], hx1 = p[7], hz1 = p[8];
            double density = p[9];
            double boxSize = Math.sqrt(100 / density);
            Random rand = new Random(seed);
            StringBuilder pts = new StringBuilder();
            int nbz = (int) ((z1 - z0) / boxSize);
            int nbx = (int) ((x1 - x0) / boxSize);
            for (int boxZ = 0; boxZ <= nbz; ++boxZ) {
                for (int boxX = 0; boxX <= nbx; ++boxX) {
                    double bx0 = x0 + boxSize * boxX;
                    double bz0 = z0 + boxSize * boxZ;
                    double bx1 = x0 + boxSize * (boxX + 1);
                    double bz1 = z0 + boxSize * (boxZ + 1);
                    // skip rule: neither contains nor intersects the
                    // region == box strictly inside the hole (the grid
                    // never leaves the outer bbox except past max edges,
                    // which still touch the boundary)
                    boolean insideHole = bx0 > hx0 && bx1 < hx1 && bz0 > hz0 && bz1 < hz1;
                    boolean outside = bx0 >= x1 || bz0 >= z1;
                    if (insideHole || outside) continue;
                    for (int i = 0; i < POINTS_PER_BOX; ++i) {
                        double x = bx0 + boxSize * rand.nextDouble();
                        double z = bz0 + boxSize * rand.nextDouble();
                        boolean in = x > x0 && x < x1 && z > z0 && z < z1
                                && !(x > hx0 && x < hx1 && z > hz0 && z < hz1);
                        if (in) {
                            if (pts.length() > 0) pts.append(",");
                            pts.append(String.format("[%d,%d,%d,%.17g,%.17g]", boxX, boxZ, i, x, z));
                        }
                    }
                }
            }
            System.out.printf("{\"seed\":%d,\"x0\":%s,\"z0\":%s,\"x1\":%s,\"z1\":%s,\"hx0\":%s,\"hz0\":%s,\"hx1\":%s,\"hz1\":%s,\"density\":%s,\"points\":[%s]}%s%n",
                seed, p[1], p[2], p[3], p[4], p[5], p[6], p[7], p[8], p[9], pts,
                c + 1 < cases.length ? "," : "");
        }
        System.out.println("]");
    }
}
