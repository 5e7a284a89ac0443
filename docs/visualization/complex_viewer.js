/* Interactive 3-D Flood-complex viewer.
 *
 * One parametrized p5.js WEBGL instance per dataset: renders the landmark
 * cloud and every simplex (edge / triangle / tetrahedron) whose
 * filtration value is below the currently selected radius step, with
 * drag-to-rotate and scroll-to-zoom. Equivalent functionality to the
 * reference docs viewers (reference docs/visualization/visualization_*.js),
 * implemented independently for this package's generated data.
 *
 * Usage (page-side):
 *   complexViewer({
 *     container: "viz-torus", prev: "viz-torus-prev", next: "viz-torus-next",
 *     label: "viz-torus-label", folder: "../visualization/torus/",
 *     steps: [0, 0.05, 0.1, ...], scale: 100,
 *   });
 *
 * Data layout (written by generate_viz_csvs.py): landmarks.csv (x,y,z),
 * edges.csv (i,j,t), triangles.csv (i,j,k,t), tetrahedra.csv (i,j,k,l,t).
 */

"use strict";

function complexViewer(cfg) {
  new p5((p) => {
    let pts = [];
    let cells = { edge: [], tri: [], tet: [] };
    let step = 0;
    let spin = { x: -0.5, y: 0.6, dragging: false, mx: 0, my: 0 };
    let zoom = 1;
    let tables = {};

    const palette = {
      paper: [255, 255, 255],
      dot: [40, 40, 40],
      edge: [235, 175, 20],
      tri: [235, 175, 20, 140],
      tet: [235, 175, 20, 90],
    };

    p.preload = () => {
      tables.lms = p.loadTable(cfg.folder + "landmarks.csv", "csv", "noHeader");
      tables.edg = p.loadTable(cfg.folder + "edges.csv", "csv", "noHeader");
      tables.tri = p.loadTable(cfg.folder + "triangles.csv", "csv", "noHeader");
      tables.tet = p.loadTable(cfg.folder + "tetrahedra.csv", "csv", "noHeader");
    };

    p.setup = () => {
      const box = document.getElementById(cfg.container);
      if (!box) return;
      const h = box.clientHeight || 300;
      p.createCanvas(h * 2, h, p.WEBGL).parent(box);
      p.pixelDensity(2);

      const raw = tables.lms.getArray().map((r) => r.map(Number));
      // center and scale to a fixed viewing size
      let lo = [Infinity, Infinity, Infinity];
      let hi = [-Infinity, -Infinity, -Infinity];
      for (const q of raw) {
        for (let a = 0; a < 3; a++) {
          lo[a] = Math.min(lo[a], q[a]);
          hi[a] = Math.max(hi[a], q[a]);
        }
      }
      const mid = lo.map((v, a) => (v + hi[a]) / 2);
      const ext = Math.max(hi[0] - lo[0], hi[1] - lo[1], hi[2] - lo[2]);
      const s = (cfg.scale || 250) / ext;
      pts = raw.map((q) => q.map((v, a) => (v - mid[a]) * s));

      const num = (r) => r.map(Number);
      cells.edge = tables.edg.getArray().map(num);
      cells.tri = tables.tri.getArray().map(num);
      cells.tet = tables.tet.getArray().map(num);

      const move = (d) => {
        step = Math.max(0, Math.min(cfg.steps.length - 1, step + d));
        refreshLabel();
        p.redraw();
      };
      document.getElementById(cfg.prev).addEventListener("click", () => move(-1));
      document.getElementById(cfg.next).addEventListener("click", () => move(1));
      refreshLabel();
      p.noLoop();
    };

    function refreshLabel() {
      const el = document.getElementById(cfg.label);
      if (el) el.textContent = "t = " + cfg.steps[step];
    }

    p.mousePressed = () => {
      if (
        p.mouseX >= 0 && p.mouseX <= p.width &&
        p.mouseY >= 0 && p.mouseY <= p.height
      ) {
        spin.dragging = true;
        spin.mx = p.mouseX;
        spin.my = p.mouseY;
      }
    };
    p.mouseReleased = () => (spin.dragging = false);
    p.mouseDragged = () => {
      if (!spin.dragging) return;
      spin.y += (p.mouseX - spin.mx) * 0.01;
      spin.x += (p.mouseY - spin.my) * 0.01;
      spin.mx = p.mouseX;
      spin.my = p.mouseY;
      p.redraw();
      return false;
    };
    p.mouseWheel = (e) => {
      if (
        p.mouseX >= 0 && p.mouseX <= p.width &&
        p.mouseY >= 0 && p.mouseY <= p.height
      ) {
        zoom *= e.delta > 0 ? 0.93 : 1.075;
        p.redraw();
        return false;
      }
    };

    p.draw = () => {
      const t = cfg.steps[step];
      p.background(...palette.paper);
      p.scale(zoom);
      p.rotateX(spin.x);
      p.rotateY(spin.y);

      // vertices
      p.stroke(...palette.dot);
      p.strokeWeight(3);
      for (const q of pts) p.point(q[0], q[1], q[2]);

      // edges below threshold
      p.strokeWeight(1);
      p.stroke(...palette.edge);
      for (const [i, j, v] of cells.edge) {
        if (v <= t) {
          p.line(
            pts[i][0], pts[i][1], pts[i][2],
            pts[j][0], pts[j][1], pts[j][2]
          );
        }
      }

      // triangles below threshold
      p.noStroke();
      p.fill(...palette.tri);
      p.beginShape(p.TRIANGLES);
      for (const [i, j, k, v] of cells.tri) {
        if (v <= t) {
          p.vertex(pts[i][0], pts[i][1], pts[i][2]);
          p.vertex(pts[j][0], pts[j][1], pts[j][2]);
          p.vertex(pts[k][0], pts[k][1], pts[k][2]);
        }
      }
      p.endShape();

      // tetrahedra below threshold (render the 4 faces)
      p.fill(...palette.tet);
      p.beginShape(p.TRIANGLES);
      for (const [i, j, k, l, v] of cells.tet) {
        if (v <= t) {
          for (const [a, b, c] of [
            [i, j, k], [i, j, l], [i, k, l], [j, k, l],
          ]) {
            p.vertex(pts[a][0], pts[a][1], pts[a][2]);
            p.vertex(pts[b][0], pts[b][1], pts[b][2]);
            p.vertex(pts[c][0], pts[c][1], pts[c][2]);
          }
        }
      }
      p.endShape();
    };
  });
}
