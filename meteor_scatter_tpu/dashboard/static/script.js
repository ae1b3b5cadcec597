/* Dashboard frontend — feature parity with the reference static/js/script.js:
 * chart fetching with cache busting, periodic refresh of charts and the
 * missing-days list, slideshow with configurable interval, 1 Hz clock. */

(function () {
  "use strict";

  var CHART_TYPES = ["tagesverlauf", "week", "month"];
  var chartUrls = {};
  var slideIndex = 0;
  var slideshowTimer = null;
  var slideshowInterval = 10000;
  var paused = false;

  function apiUrl(path) {
    return (SCRIPT_ROOT || "") + path;
  }

  /* fetch a chart and cache-bust the returned image URL (ref :10-41) */
  function loadChart(type, cb) {
    fetch(apiUrl("/load_chart/" + type))
      .then(function (r) { return r.json(); })
      .then(function (data) {
        if (data.img_url) {
          chartUrls[type] = data.img_url + "?t=" + Date.now();
          if (cb) cb(chartUrls[type]);
        }
      })
      .catch(function (e) { console.error("chart " + type + ":", e); });
  }

  function showSlide(i) {
    slideIndex = (i + CHART_TYPES.length) % CHART_TYPES.length;
    var type = CHART_TYPES[slideIndex];
    var img = document.getElementById("slide-img");
    var label = document.getElementById("slide-label");
    if (chartUrls[type]) {
      img.src = chartUrls[type];
    } else {
      loadChart(type, function (url) { img.src = url; });
    }
    label.textContent = type;
  }

  function nextSlide() { showSlide(slideIndex + 1); }
  function prevSlide() { showSlide(slideIndex - 1); }

  function startSlideshow() {
    if (slideshowTimer) clearInterval(slideshowTimer);
    slideshowTimer = setInterval(function () {
      if (!paused) nextSlide();
    }, slideshowInterval);
  }

  /* periodic refresh of charts + missing days (ref :52-99) */
  function refreshAll() {
    CHART_TYPES.forEach(function (t) {
      loadChart(t, function (url) {
        if (CHART_TYPES[slideIndex] === t) {
          document.getElementById("slide-img").src = url;
        }
      });
    });
    loadChart("zeiger", function (url) {
      document.getElementById("gauge-img").src = url;
    });
    fetch(apiUrl("/api/dynamischer_inhalt"), { cache: "no-store" })
      .then(function (r) { return r.json(); })
      .then(function (data) {
        var ul = document.getElementById("missing-days");
        ul.innerHTML = "";
        if (!data.missing_days || data.missing_days.length === 0) {
          ul.innerHTML = "<li>keine 😊</li>";
        } else {
          data.missing_days.forEach(function (d) {
            var li = document.createElement("li");
            li.textContent = d;
            ul.appendChild(li);
          });
        }
      })
      .catch(function (e) { console.error("missing days:", e); });
  }

  /* 1 Hz clock (ref :203-222) */
  function tickClock() {
    var el = document.getElementById("clock");
    if (el) el.textContent = new Date().toLocaleString("de-DE");
  }

  document.addEventListener("DOMContentLoaded", function () {
    document.getElementById("next-btn").addEventListener("click", nextSlide);
    document.getElementById("prev-btn").addEventListener("click", prevSlide);
    document.getElementById("pause-btn").addEventListener("click", function () {
      paused = !paused;
      this.textContent = paused ? "▶" : "⏸";
    });

    fetch(apiUrl("/config/slideshow_interval"))
      .then(function (r) { return r.json(); })
      .then(function (data) {
        var v = parseInt(data.slideshow_interval, 10);
        if (v > 0) slideshowInterval = v;
        startSlideshow();
      })
      .catch(function () { startSlideshow(); });

    refreshAll();
    showSlide(0);
    setInterval(refreshAll, RELOAD_INTERVAL);
    setInterval(tickClock, 1000);
    tickClock();
  });
})();
