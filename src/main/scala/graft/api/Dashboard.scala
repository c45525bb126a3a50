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
      |<h1>graft <span style="font-size:0.8rem;float:right"><a href="/dashboard/connections">connections</a> · <a href="/logout">logout</a></span></h1>
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

  private val pageCss =
    """ body { font-family: system-ui, sans-serif; margin: 2rem auto; max-width: 60rem; }
      | table { border-collapse: collapse; margin: 1rem 0; }
      | td, th { border: 1px solid #ccc; padding: 0.25rem 0.6rem; text-align: left; }
      | input, select, button { font-size: 0.9rem; padding: 0.3rem 0.5rem; margin: 0.2rem 0.4rem 0.2rem 0; }
      | label { display: block; margin-top: 0.6rem; }
      | .flash { color: #b00020; }
      | pre { background: #f4f4f4; padding: 1rem; overflow-x: auto; }
      | nav a { margin-right: 0.8rem; }""".stripMargin

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def page(title: String, body: String): String =
    s"""<!doctype html>
       |<html lang="en">
       |<head><meta charset="utf-8"><title>${esc(title)} — graft</title>
       |<style>
       |$pageCss
       |</style></head>
       |<body>
       |<nav><a href="/dashboard">console</a><a href="/dashboard/connections">connections</a><a href="/logout">logout</a></nav>
       |<h1>${esc(title)}</h1>
       |$body
       |</body></html>
       |""".stripMargin

  /** Connections index (reference:
    * pkg/view/templates/pages/connections/index.html — list of
    * registered destinations + "connect" entry points). */
  def connectionsHtml(dests: Seq[(String, String)]): String = {
    val rows =
      if (dests.isEmpty)
        "<p>No connections yet. Get started by connecting a database.</p>"
      else
        dests.map { case (n, t) =>
          s"""<tr><td>${esc(n)}</td><td>${esc(t)}</td>
             |<td><form method="post" action="/dashboard/connections/key" style="display:inline">
             |  <input type="hidden" name="name" value="${esc(n)}">
             |  <input name="api_key" placeholder="new key (8+)" required>
             |  <button type="submit">Add key</button></form>
             |<form method="post" action="/dashboard/connections/delete" style="display:inline">
             |  <input type="hidden" name="name" value="${esc(n)}">
             |  <button type="submit">Delete</button></form></td></tr>""".stripMargin
        }.mkString("<table><tr><th>name</th><th>type</th><th></th></tr>", "", "</table>")
    page("Connections",
      s"""$rows
         |<p><a href="/dashboard/connections/new">Connect a database</a></p>
         |<form method="post" action="/dashboard/request">
         |  <button type="submit">Mint a connection-request link</button>
         |</form>""".stripMargin)
  }

  /** New-connection form (reference:
    * pkg/view/templates/pages/connections/new.html — destination type
    * chooser + settings form). */
  def newConnectionHtml(flash: String): String =
    page("Connect a database",
      s"""${if (flash.isEmpty) "" else s"""<p class="flash">${esc(flash)}</p>"""}
         |<form method="post" action="/dashboard/connections/new">
         |  <label>Name <input name="name" placeholder="mydb" required></label>
         |  <label>Type
         |    <select name="type">
         |      <option value="spark">spark (this warehouse)</option>
         |      <option value="jdbc">jdbc (external engine)</option>
         |    </select></label>
         |  <label>JDBC URL <input name="url" size="48" placeholder="jdbc:… (jdbc type only)"></label>
         |  <label>First API key <input name="api_key" placeholder="8+ characters" required></label>
         |  <button type="submit">Create</button>
         |</form>""".stripMargin)

  /** Request-link page (reference:
    * pkg/view/templates/pages/request/link.html — "send this link to
    * your customer", one-time upsert URL). */
  def requestLinkHtml(url: String): String =
    page("Connection request",
      s"""<p>Send this one-time link to your customer; it expires in 1 hour:</p>
         |<pre>${esc(url)}</pre>
         |<p>POST to it with {"name", "type", "api_key"} (and "url" for
         |jdbc destinations) registers their database.</p>""".stripMargin)

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
