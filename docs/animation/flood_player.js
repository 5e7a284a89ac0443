/* Flood-complex animation player.
 *
 * Replays the flooding process on the figure-eight demo data produced by
 * generate_csvs.py (points / landmarks / filtered edges / filtered
 * triangles): balls of radius t grow around every witness point, and each
 * simplex of the landmark Delaunay triangulation pops in once t reaches
 * its filtration value. Equivalent functionality to the reference docs
 * animation (reference docs/animation/flood_triangle.js), implemented
 * independently for this package's data layout.
 *
 * Expects, in the embedding page:
 *   <div id="flood-anim"></div>
 *   <button id="flood-play"><i class="fa fa-play"></i></button>
 *   <input type="range" id="flood-t" min="0" max="4" step="0.01" value="0">
 */

"use strict";

const floodAnim = (() => {
  const CANVAS_W = 600;
  const CANVAS_H = 300;
  const T_SCALE = 0.025; // slider unit -> data radius
  const SPEED = 0.010; // slider units per frame while playing

  let witnesses = []; // [{x, y}]
  let marks = []; // landmark coordinates [{x, y}]
  let simplexEdges = []; // [{a, b, t}]
  let simplexTris = []; // [{a, b, c, t}]
  let playing = true;
  let slider, playBtn;
  let theme;

  function readRows(table, ncols) {
    const rows = [];
    for (let r = 0; r < table.getRowCount(); r++) {
      const vals = [];
      for (let c = 0; c < ncols; c++) {
        vals.push(parseFloat(table.getString(r, c)));
      }
      rows.push(vals);
    }
    return rows;
  }

  function pickTheme() {
    const scheme = document.documentElement.getAttribute(
      "data-md-color-scheme"
    );
    if (scheme === "slate") {
      return {
        paper: 10,
        ball: [70, 90, 140, 70],
        witness: [230, 230, 230],
        landmark: [255, 200, 40],
        edgeOn: [130, 190, 250, 220],
        face: [90, 110, 230, 60],
      };
    }
    return {
      paper: 255,
      ball: [165, 175, 190, 80],
      witness: [30, 30, 30],
      landmark: [240, 180, 20],
      edgeOn: [240, 180, 20, 255],
      face: [240, 180, 20, 90],
    };
  }

  // data domain -> canvas (fit with margin, y flipped)
  let fit = { sx: 1, sy: 1, ox: 0, oy: 0 };
  function computeFit() {
    let xmin = Infinity, xmax = -Infinity, ymin = Infinity, ymax = -Infinity;
    for (const p of witnesses) {
      xmin = Math.min(xmin, p.x); xmax = Math.max(xmax, p.x);
      ymin = Math.min(ymin, p.y); ymax = Math.max(ymax, p.y);
    }
    const m = 20;
    const s = Math.min(
      (CANVAS_W - 2 * m) / (xmax - xmin),
      (CANVAS_H - 2 * m) / (ymax - ymin)
    );
    fit = {
      sx: s,
      sy: -s,
      ox: m - xmin * s + (CANVAS_W - 2 * m - (xmax - xmin) * s) / 2,
      oy: CANVAS_H - m + ymin * s,
    };
  }
  const X = (p) => fit.ox + p.x * fit.sx;
  const Y = (p) => fit.oy + p.y * fit.sy;
  const S = () => Math.abs(fit.sx);

  let tables = {};

  window.preload = function () {
    tables.pts = loadTable("animation/points.csv", "csv", "noHeader");
    tables.lms = loadTable("animation/landmarks.csv", "csv", "noHeader");
    tables.edg = loadTable("animation/edges.csv", "csv", "noHeader");
    tables.tri = loadTable("animation/triangles.csv", "csv", "noHeader");
  };

  window.setup = function () {
    const cv = createCanvas(CANVAS_W, CANVAS_H);
    cv.parent("flood-anim");
    theme = pickTheme();

    witnesses = readRows(tables.pts, 2).map(([x, y]) => ({ x, y }));
    marks = readRows(tables.lms, 2).map(([x, y]) => ({ x, y }));
    simplexEdges = readRows(tables.edg, 3).map(([a, b, t]) => ({
      a: marks[a | 0], b: marks[b | 0], t,
    }));
    simplexTris = readRows(tables.tri, 4).map(([a, b, c, t]) => ({
      a: marks[a | 0], b: marks[b | 0], c: marks[c | 0], t,
    }));
    computeFit();

    slider = document.getElementById("flood-t");
    playBtn = document.getElementById("flood-play");
    const icon = playBtn.querySelector("i");
    icon.classList.replace("fa-play", "fa-pause");
    playBtn.addEventListener("click", () => {
      if (!playing && parseFloat(slider.value) >= parseFloat(slider.max)) {
        slider.value = 0; // restart from the beginning
      }
      playing = !playing;
      icon.classList.toggle("fa-play", !playing);
      icon.classList.toggle("fa-pause", playing);
    });
    slider.addEventListener("input", () => {
      playing = false;
      icon.classList.replace("fa-pause", "fa-play");
    });
  };

  window.draw = function () {
    theme = pickTheme();
    background(theme.paper);
    if (playing) {
      const next = parseFloat(slider.value) + SPEED;
      if (next >= parseFloat(slider.max)) {
        slider.value = slider.max;
        playing = false;
        const icon = playBtn.querySelector("i");
        icon.classList.replace("fa-pause", "fa-play");
      } else {
        slider.value = next;
      }
    }
    const t = parseFloat(slider.value) * T_SCALE;

    // flooding balls
    noStroke();
    fill(...theme.ball);
    const r = 2 * t * S();
    for (const p of witnesses) circle(X(p), Y(p), r);

    // covered triangles
    fill(...theme.face);
    for (const f of simplexTris) {
      if (f.t <= t) {
        triangle(X(f.a), Y(f.a), X(f.b), Y(f.b), X(f.c), Y(f.c));
      }
    }

    // covered edges
    strokeWeight(1.5);
    for (const e of simplexEdges) {
      if (e.t <= t) {
        stroke(...theme.edgeOn);
        line(X(e.a), Y(e.a), X(e.b), Y(e.b));
      }
    }

    // witness dots and landmarks
    noStroke();
    fill(theme.witness);
    for (const p of witnesses) circle(X(p), Y(p), 2.5);
    fill(...theme.landmark);
    for (const p of marks) circle(X(p), Y(p), 6);
  };

  return {};
})();
