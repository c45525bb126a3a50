package graft.api

/** Dashboard-lite: the reference's most-visible surface is an HTML
  * query console (/root/reference/pkg/view/controller.go:1-323,
  * pkg/view/templates/, mounted at pkg/api/router.go:78-88). This is a
  * single-file console over the same API endpoints — run a query,
  * switch output format, list tables, mint a share link — no external
  * assets (zero-egress container), no templating engine needed.
  */
object Dashboard {
  val html: String =
    """<!doctype html>
      |<html lang="en">
      |<head>
      |<meta charset="utf-8">
      |<title>graft console</title>
      |<style>
      | body { font-family: system-ui, sans-serif; margin: 2rem auto; max-width: 60rem; }
      | textarea { width: 100%; height: 7rem; font-family: monospace; font-size: 0.9rem; }
      | input, select, button { font-size: 0.9rem; padding: 0.3rem 0.5rem; margin-right: 0.5rem; }
      | pre { background: #f4f4f4; padding: 1rem; overflow-x: auto; min-height: 3rem; }
      | table { border-collapse: collapse; }
      | td, th { border: 1px solid #ccc; padding: 0.25rem 0.6rem; text-align: left; }
      | .bar { margin: 0.75rem 0; display: flex; align-items: center; flex-wrap: wrap; gap: 0.4rem; }
      | .err { color: #b00020; }
      |</style>
      |</head>
      |<body>
      |<h1>graft <a href="/logout" style="font-size:0.8rem;float:right">logout</a></h1>
      |<div class="bar">
      |  <label>API key <input id="key" type="password" placeholder="api_key"></label>
      |  <select id="fmt"><option>json</option><option>ndjson</option><option>csv</option></select>
      |  <button onclick="listTables()">tables</button>
      |</div>
      |<textarea id="sql" placeholder="select 1 as x"></textarea>
      |<div class="bar">
      |  <button onclick="run()">Run</button>
      |  <button onclick="share()">Share (1h)</button>
      |  <span id="status"></span>
      |</div>
      |<div id="out"><pre id="raw"></pre></div>
      |<script>
      |const $ = id => document.getElementById(id);
      |const esc = s => s.replace(/[&<>]/g, c => ({'&':'&amp;','<':'&lt;','>':'&gt;'}[c]));
      |async function call(path, opts) {
      |  const r = await fetch(path, opts);
      |  const text = await r.text();
      |  if (!r.ok) throw new Error(r.status + ': ' + text);
      |  return text;
      |}
      |function qs() { return 'api_key=' + encodeURIComponent($('key').value); }
      |async function run() {
      |  $('status').textContent = 'running…'; $('status').className = '';
      |  try {
      |    const fmt = $('fmt').value;
      |    const text = await call('/api/data/query?' + qs() + '&format=' + fmt,
      |      { method: 'POST', body: $('sql').value });
      |    if (fmt === 'json') renderTable(JSON.parse(text)); else $('raw').textContent = text;
      |    $('status').textContent = 'ok';
      |  } catch (e) { $('raw').textContent = ''; $('status').textContent = e.message; $('status').className = 'err'; }
      |}
      |function renderTable(rows) {
      |  if (!rows.length) { $('raw').textContent = '(0 rows)'; return; }
      |  const cols = Object.keys(rows[0]);
      |  let h = '<table><tr>' + cols.map(c => '<th>' + esc(c) + '</th>').join('') + '</tr>';
      |  for (const r of rows) h += '<tr>' + cols.map(c => '<td>' + esc(String(r[c] ?? 'null')) + '</td>').join('') + '</tr>';
      |  $('out').innerHTML = h + '</table><pre id="raw"></pre>';
      |}
      |async function listTables() {
      |  try { $('raw').textContent = await call('/api/tables?' + qs()); }
      |  catch (e) { $('status').textContent = e.message; $('status').className = 'err'; }
      |}
      |async function share() {
      |  try {
      |    const body = JSON.stringify({ query: $('sql').value, duration: 3600, name: 'console' });
      |    const r = JSON.parse(await call('/api/data/query/share?' + qs(), { method: 'POST', body }));
      |    $('raw').textContent = location.origin + '/share/' + r.id + '/data.json';
      |  } catch (e) { $('status').textContent = e.message; $('status').className = 'err'; }
      |}
      |</script>
      |</body>
      |</html>
      |""".stripMargin

  /** Public share-viewer page: renders the shared result set for a
    * bare /share/{uuid} link (reference: pkg/view/router.go:43-76). */
  def shareHtml(uuid: String, name: String): String = {
    val esc = name.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    s"""<!doctype html>
       |<html lang="en">
       |<head><meta charset="utf-8"><title>$esc — graft share</title>
       |<style>
       | body { font-family: system-ui, sans-serif; margin: 2rem auto; max-width: 60rem; }
       | table { border-collapse: collapse; }
       | td, th { border: 1px solid #ccc; padding: 0.25rem 0.6rem; text-align: left; }
       |</style></head>
       |<body>
       |<h1>$esc</h1>
       |<p><a href="/share/$uuid/data.json">json</a> ·
       |   <a href="/share/$uuid/data.csv">csv</a> ·
       |   <a href="/share/$uuid/data.ndjson">ndjson</a></p>
       |<div id="out">loading…</div>
       |<script>
       |const esc = s => s.replace(/[&<>]/g, c => ({'&':'&amp;','<':'&lt;','>':'&gt;'}[c]));
       |fetch('/share/$uuid/data.json').then(r => r.json()).then(rows => {
       |  if (!rows.length) { document.getElementById('out').textContent = '(0 rows)'; return; }
       |  const cols = Object.keys(rows[0]);
       |  let h = '<table><tr>' + cols.map(c => '<th>' + esc(c) + '</th>').join('') + '</tr>';
       |  for (const r of rows) h += '<tr>' + cols.map(c => '<td>' + esc(String(r[c] ?? 'null')) + '</td>').join('') + '</tr>';
       |  document.getElementById('out').innerHTML = h + '</table>';
       |}).catch(e => { document.getElementById('out').textContent = String(e); });
       |</script>
       |</body></html>
       |""".stripMargin
  }
}
