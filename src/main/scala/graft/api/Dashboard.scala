package graft.api

/** Dashboard-lite: the reference's most-visible surface is an HTML
  * query console (/root/reference/pkg/view/controller.go:1-323,
  * pkg/view/templates/, mounted at pkg/api/router.go:78-88). This is a
  * single-file console over the same API endpoints — run a query,
  * switch output format, list tables, mint a share link — no external
  * assets (zero-egress container), no templating engine needed.
  */
object Dashboard {

  /** Shared plain-CSS design system — the visual parity pass for the
    * reference's Tailwind-styled pages (cards on a gray canvas,
    * accent buttons, soft borders) without any external asset: the
    * container is zero-egress, so everything ships inline. */
  private[api] val sharedCss =
    """ :root { --accent: #4f46e5; --accent-dark: #4338ca; --ink: #111827;
      |   --muted: #6b7280; --line: #e5e7eb; --canvas: #f9fafb; --card: #ffffff; }
      | * { box-sizing: border-box; }
      | body { font-family: system-ui, -apple-system, sans-serif; margin: 0;
      |   background: var(--canvas); color: var(--ink); }
      | main { max-width: 62rem; margin: 1.5rem auto; padding: 0 1rem; }
      | h1 { font-size: 1.3rem; margin: 0.5rem 0 1rem; }
      | nav { background: var(--card); border-bottom: 1px solid var(--line);
      |   padding: 0.7rem 1.2rem; display: flex; gap: 1rem; align-items: baseline; }
      | nav .brand { font-weight: 700; color: var(--accent); margin-right: 1rem;
      |   text-decoration: none; font-size: 1.05rem; }
      | nav a { color: var(--muted); text-decoration: none; }
      | nav a:hover { color: var(--ink); }
      | .card { background: var(--card); border: 1px solid var(--line);
      |   border-radius: 0.5rem; padding: 1rem 1.2rem; margin: 1rem 0;
      |   box-shadow: 0 1px 2px rgba(0,0,0,0.04); }
      | textarea { width: 100%; height: 7rem; font-family: ui-monospace, monospace;
      |   font-size: 0.9rem; border: 1px solid var(--line); border-radius: 0.4rem;
      |   padding: 0.6rem; }
      | input, select { font-size: 0.9rem; padding: 0.4rem 0.6rem;
      |   border: 1px solid var(--line); border-radius: 0.4rem; background: var(--card); }
      | button { font-size: 0.9rem; padding: 0.4rem 0.9rem; border: 0;
      |   border-radius: 0.4rem; background: var(--accent); color: #fff; cursor: pointer; }
      | button:hover { background: var(--accent-dark); }
      | pre { background: #f3f4f6; border: 1px solid var(--line); border-radius: 0.4rem;
      |   padding: 1rem; overflow-x: auto; min-height: 3rem; }
      | table { border-collapse: collapse; margin: 0.5rem 0; width: 100%; }
      | td, th { border-bottom: 1px solid var(--line); padding: 0.45rem 0.7rem;
      |   text-align: left; }
      | th { color: var(--muted); font-weight: 600; font-size: 0.85rem;
      |   text-transform: uppercase; letter-spacing: 0.03em; }
      | tr:hover td { background: var(--canvas); }
      | label { display: block; margin-top: 0.6rem; color: var(--muted); }
      | .bar { margin: 0.75rem 0; display: flex; align-items: center;
      |   flex-wrap: wrap; gap: 0.4rem; }
      | .err, .flash { color: #b91c1c; }""".stripMargin

  // head is interpolated (it carries the stylesheet); the body stays a
  // RAW string — its JavaScript is full of `$(...)` lookups that the
  // s-interpolator would reject
  val html: String =
    s"""<!doctype html>
       |<html lang="en">
       |<head>
       |<meta charset="utf-8">
       |<title>graft console</title>
       |<style>
       |$sharedCss
       |</style>
       |</head>
       |<body>
       |<nav><a class="brand" href="/dashboard">graft</a>
       |<a href="/dashboard/connections">connections</a>
       |<a href="/logout">logout</a></nav>
       |<main>
       |""".stripMargin +
    """<div class="bar">
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
      |</main>
      |</body>
      |</html>
      |""".stripMargin

  private val pageCss = sharedCss

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
       |<nav><a class="brand" href="/dashboard">graft</a>
       |<a href="/dashboard">console</a>
       |<a href="/dashboard/connections">connections</a>
       |<a href="/logout">logout</a></nav>
       |<main>
       |<h1>${esc(title)}</h1>
       |<div class="card">
       |$body
       |</div>
       |</main>
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
       |$sharedCss
       |</style></head>
       |<body>
       |<nav><span class="brand">graft</span></nav>
       |<main>
       |<h1>$esc</h1>
       |<p><a href="/share/$uuid/data.json">json</a> ·
       |   <a href="/share/$uuid/data.csv">csv</a> ·
       |   <a href="/share/$uuid/data.ndjson">ndjson</a></p>
       |<div class="card" id="out">loading…</div>
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
       |</main>
       |</body></html>
       |""".stripMargin
  }
}
