"""Real-web-text conformance fixture for the PG-default-parser path.

The prose is genuinely real public-domain text — the opening of the
United States Declaration of Independence (1776, no copyright; the
same text is served on archives.gov's founding-documents pages) —
wrapped in the HTML chrome a real page carries: doctype, meta tags,
quoted attributes (including a ``>`` inside an attribute value), HTML
comments, character entities, absolute and protocol-relative URLs,
emails, and file paths. The synthetic bench corpus and the Cranfield
replay under-exercise exactly this markup density (round-3 verdict
gap #8); this fixture pins the full (class, token) stream so any
scanner change on tag/entity/URL grammar is a conscious one.
"""

WEBTEXT_HTML = """\
<!DOCTYPE html>
<!-- header chrome: navigation is markup-only and must not tokenize -->
<html lang="en-US">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>Declaration of Independence: A Transcription</title>
<link rel="stylesheet" href="/styles/founding-docs.css">
</head>
<body>
<div id="main" class="page-body doc-transcript">
<h1>In Congress, July 4, 1776</h1>
<p class="intro">The unanimous Declaration of the thirteen united
States of America. Read the original at
https://www.archives.gov/founding-docs/declaration-transcript or see
the scanned image archive at www.archives.gov/founding-docs/downloads
&mdash; questions go to inquire@archives.gov.</p>
<!-- transcription begins -->
<p>When in the Course of human events, it becomes necessary for one
people to dissolve the political bands which have connected them with
another, and to assume among the powers of the earth, the separate
and equal station to which the Laws of Nature and of Nature's God
entitle them, a decent respect to the opinions of mankind requires
that they should declare the causes which impel them to the
separation.</p>
<p>We hold these truths to be self-evident, that all men are created
equal, that they are endowed by their Creator with certain
unalienable Rights, that among these are Life, Liberty and the
pursuit of Happiness.</p>
<p>That to secure these rights, Governments are instituted among Men,
deriving their just powers from the consent of the governed &mdash;
That whenever any Form of Government becomes destructive of these
ends, it is the Right of the People to alter or to abolish it, and to
institute new Government, laying its foundation on such principles
and organizing its powers in such form, as to them shall seem most
likely to effect their Safety &amp; Happiness.</p>
<img src="/images/declaration_pg1of1_ac.jpg" alt="Scan resolution > 300dpi"
     width="640" height="800">
<p class="fine-print">Page updated 2026-07-04; transcript version
1.0.2; served via http:// and https:// mirrors. Contact
&lt;webmaster&gt; c/o media@example.org &#8212; file under
/archives/founding/transcripts/declaration.txt</p>
</div>
<!-- footer -->
</body>
</html>
"""

#: second real public-domain page (round-5, verdict F10 follow-up):
#: Lincoln's Gettysburg Address (1863, no copyright — the Bliss copy's
#: text as displayed at the Lincoln Memorial), wrapped in DIFFERENT
#: markup features than WEBTEXT_HTML: an ordered list, a table with
#: attributes, a blockquote, numeric (decimal AND hex) entities,
#: deeply nested inline tags, a query-string URL, and an unterminated
#: entity in running text.
WEBTEXT_HTML_2 = """\
<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>The Gettysburg Address &#8212; Full Text</title>
</head>
<body>
<main class="speech">
<h1>Address Delivered at the Dedication of the Cemetery at
Gettysburg</h1>
<table class="meta" border="1">
<tr><td>Speaker</td><td>Abraham Lincoln</td></tr>
<tr><td>Date</td><td>November 19, 1863</td></tr>
<tr><td>Length</td><td>~272 words</td></tr>
</table>
<blockquote cite="https://www.abrahamlincolnonline.org/lincoln/speeches/gettysburg.htm?version=bliss&amp;src=loc">
<p>Four score and seven years ago our fathers brought forth on this
continent, a new nation, conceived in Liberty, and dedicated to the
proposition that all men are created equal.</p>
<p>Now we are engaged in a great civil war, testing whether that
nation, or any nation so conceived and <b><i><u>so dedicated</u></i></b>,
can long endure. We are met on a great battle-field of that war.</p>
<p>The world will little note, nor long remember what we say here,
but it can never forget what they did here &#x2014; that from these
honored dead we take increased devotion &mdash; and that government
of the people, by the people, for the people, shall not perish from
the earth.</p>
</blockquote>
<ol class="notes">
<li>Delivered at Gettysburg, Pennsylvania.</li>
<li>Five known manuscript copies exist; see the index at
/library/speeches/gettysburg/copies.txt for details.</li>
</ol>
<p class="footer">Questions &amp; corrections: curator@example.org
(cite version 2.1.0). This page uses the &quot;Bliss&quot; text; AT&T
era reprints differ.</p>
</main>
</body>
</html>
"""

#: third real public-domain page (round-6, verdict task #6): the
#: Preamble of the U.S. Constitution (1787, no copyright) inside a
#: FORM-heavy, ENTITY-DENSE archive-search page. New markup features
#: vs fixtures 1-2: <form> with action attribute, void <input>
#: elements (incl. a '>' inside a single-quoted attribute value),
#: <select>/<option>, <label>, <button>, and a <textarea> whose BODY
#: is plain text to the PG parser (tags are skipped, content between
#: them always tokenizes); named, decimal and hex entities back to
#: back, incl. &nbsp; between words (an entity is a blank — the words
#: it separates stay separate tokens).
WEBTEXT_HTML_3 = """\
<!DOCTYPE html>
<html lang="en">
<head><meta charset="utf-8"><title>Search the Archives &copy; 2026</title></head>
<body>
<form action="/search/founding-docs" method="get" class="archive-search">
<label for="q">Query:</label>
<input type="text" id="q" name="q" placeholder='terms > results'>
<select name="era">
<option value="1787">Constitutional Convention</option>
<option value="1791" selected>Bill of Rights</option>
</select>
<button type="submit">Go</button>
<textarea name="notes" rows="3">Transcription notes go here; see
/help/transcription/guide.txt first.</textarea>
</form>
<article>
<h2>Preamble &sect;&nbsp;1 &#167; &#x00A7;</h2>
<p>We the People of the United&nbsp;States, in Order to form a more
perfect Union, establish Justice, insure domestic Tranquility,
provide for the common defence, promote the general Welfare, and
secure the Blessings of Liberty to ourselves and our Posterity, do
ordain and establish this Constitution for the United States of
America.</p>
<p class="legal">Ratified 1788; effective March&nbsp;4, 1789.
R&eacute;sum&eacute; of amendments: 27 ratified &mdash; first 10 in
1791 (the &ldquo;Bill of Rights&rdquo;). Flags: &#9733;&#9733;
&amp;&amp; more at archives.gov/founding-docs &rarr; transcripts.</p>
</article>
</body>
</html>
"""

#: fourth real public-domain page: NON-LATIN scripts. Real text:
#: the opening sentence of Tolstoy's "Anna Karenina" (1877, public
#: domain, Cyrillic — includes the hyphenated "по-своему", which must
#: form an hword compound + parts exactly like Latin compounds) and
#: the first line of Homer's Odyssey (ancient Greek, polytonic
#: diacritics). PG's default parser is Unicode: letter runs in any
#: whitespace-delimited script are 'word' tokens; the english config
#: stems only what the Porter stemmer recognizes, leaving the rest
#: lowercased — the class structure, not the language, drives the
#: pipeline.
WEBTEXT_HTML_4 = """\
<!DOCTYPE html>
<html lang="ru">
<head><meta charset="utf-8"><title>Анна Каренина — Лев Толстой</title></head>
<body>
<main>
<h1>Анна Каренина</h1>
<p class="epigraph" title="часть первая">Все счастливые семьи похожи
друг на друга, каждая несчастливая семья несчастлива по-своему.</p>
<p>Лев Николаевич Толстой, 1877. Текст в общественном достоянии;
см. lib.ru/LITRA/TOLSTOJ/ для полного текста.</p>
<hr>
<blockquote lang="grc">ἄνδρα μοι ἔννεπε, μοῦσα, πολύτροπον, ὃς μάλα
πολλὰ πλάγχθη</blockquote>
<p>Homer, <i>Odyssey</i> 1.1&ndash;1.2; translation at
www.perseus.tufts.edu/hopper/text?doc=Hom.+Od.+1.1 &mdash; Mixed-script
tokens: Толстой-Tolstoy is one compound; 1877 was the год.</p>
</main>
</body>
</html>
"""

#: fifth real public-domain page: the opening of Moby-Dick (1851, no
#: copyright) as a code-literate blog post. Pins a CONTRACT CORNER:
#: PG's default parser has no element-content awareness — <script>,
#: <style>, <pre>, <code> BODIES are plain text (only the tags
#: themselves are skipped), so a page's CSS selectors and JS
#: identifiers DO tokenize into the index, exactly as to_tsvector
#: does. Also: <dl>/<dt>/<dd> definition markup and a <pre> block
#: whose indentation must not perturb tokenization.
WEBTEXT_HTML_5 = """\
<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>Reading Moby-Dick, annotated</title>
<style>
.chapter h2 { font-variant: small-caps; }
</style>
<script>
var pageId = 42; // analytics-stub
</script>
</head>
<body>
<article class="chapter">
<h2>Chapter 1: Loomings</h2>
<p>Call me Ishmael. Some years ago &mdash; never mind how long
precisely &mdash; having little or no money in my purse, and nothing
particular to interest me on shore, I thought I would sail about a
little and see the watery part of the world.</p>
<dl>
<dt>whale-ship</dt>
<dd>A vessel fitted for the whale fishery; Melville's own
school-and-college.</dd>
<dt>hypos</dt>
<dd>Low spirits; the blues.</dd>
</dl>
<pre><code>
  grep -c "whale" moby_dick.txt   # 1685 or so
</code></pre>
<p>Etext available at gutenberg.org/ebooks/2701 (Project Gutenberg
ebook #2701, public domain).</p>
</article>
</body>
</html>
"""

#: sixth real public-domain page (round-7, verdict task #6
#: "RSS/XML-ish, broken markup"): the opening stanza of Poe's "The
#: Raven" (1845, no copyright) inside an RSS 2.0 feed. Pins XML-side
#: contract corners from PG's wparser_def.c state machine:
#: - ``<?xml ...?>`` IS a tag (TPS_InXMLBegin: '<?' + literal 'x'
#:   enters the in-tag state) — declaration attrs never tokenize;
#: - ``<?php ... ?>`` is NOT a tag ('<?' + 'p' pops): the '?' is a
#:   blank and the PHP source tokenizes, exactly as to_tsvector does;
#: - ``<![CDATA[...]]>`` is NOT a tag ('<!' + '[' pops — only '-'
#:   (comment) or a letter (DOCTYPE) continue): the literal token
#:   "CDATA" leaks as a word and the section BODY tokenizes;
#: - namespaced tags (<media:content .../>) and self-closing tags are
#:   ordinary tags (':' and '/' are legal in-tag chars);
#: - broken markup: a freestanding '<' (followed by non-letter) is a
#:   blank, and an unclosed tag at EOF rewinds — its name tokenizes.
WEBTEXT_HTML_6 = """\
<?xml version="1.0" encoding="utf-8"?>
<rss version="2.0" xmlns:media="http://search.yahoo.com/mrss/">
<channel>
<title><![CDATA[Verse of the Day & Archive]]></title>
<link>https://poems.example.org/feed/raven</link>
<pubDate>Wed, 29 Jan 1845 12:00:00 GMT</pubDate>
<item>
<title>The Raven, stanza 1</title>
<media:content url="https://poems.example.org/audio/raven.mp3" type="audio/mpeg"/>
<description><![CDATA[Once upon a midnight dreary, while I pondered,
weak and weary, Over many a quaint and curious volume of forgotten
lore &mdash; While I nodded, nearly napping, suddenly there came a
tapping, As of some one gently rapping, rapping at my chamber door.]]>
</description>
<guid isPermaLink="false">raven-1845-001</guid>
</item>
<?php echo feed_footer(); ?>
</channel>
</rss>
<p>renders < 5 ms on mirror-02; validator output at
/var/log/feeds/raven.log</p>
<em broken-unclosed
"""

#: seventh real public-domain page (round-7, verdict task #6
#: "mixed-script CJK"): real classical/modern CJK text — the opening
#: of the Analects (論語·學而, ~480 BC), the first lines of Natsume
#: Soseki's "I Am a Cat" (吾輩は猫である, 1905; author d. 1916), and
#: the Hunminjeongeum preface (1446) — in one mixed-script page. The
#: reference contract (/root/reference/README.md:598-612): PG's
#: default parser does NOT emit per-word tokens for CJK — a letter
#: run unbroken by spaces/punctuation is ONE 'word' token, and CJK
#: full-width punctuation (，。：「」？) is a blank. Mixed-script
#: hyphen compounds and digit-embedded runs take the same classes as
#: Latin (hword/numword) — the class structure, not the script,
#: drives the pipeline.
WEBTEXT_HTML_7 = """\
<!DOCTYPE html>
<html lang="zh-Hant">
<head><meta charset="utf-8"><title>三語讀本 — 論語・漱石・訓民正音</title></head>
<body>
<article title="古典文本">
<h1>論語 學而第一</h1>
<p>子曰：「學而時習之，不亦說乎？有朋自遠方來，不亦樂乎？人不知而不慍，
不亦君子乎？」</p>
<h1 lang="ja">吾輩は猫である</h1>
<p lang="ja">吾輩は猫である。名前はまだ無い。どこで生れたかとんと
見当がつかぬ。夏目漱石、明治38年（1905年）。</p>
<h1 lang="ko">훈민정음 서문</h1>
<p lang="ko">나랏말싸미 듕귁에 달아 문자와로 서르 사맛디 아니할쌔.</p>
<p>Bilingual index: 東京-Tokyo, 北京-Beijing; sources at
zh.wikisource.org/wiki/論語/學而第一 (public domain). Reading list
updated 平成30年.</p>
</article>
</body>
</html>
"""

#: eighth real-web-shaped page (round-7): the release-notes/pricing
#: page — the numeric-and-contact-heavy commerce shape. Exercises at
#: page level the numeric token classes the unit suite pins in
#: isolation (contract: /root/reference/README.md:581-629,
#: src/access/build.c:806-1059): version (2.4.1), numword (v2),
#: float (37.5), sfloat (1.5e-9, 6.02e23), signed int (-3; each
#: phone-number segment), date split (2026-08-18 -> uint,int,int),
#: numhword with hword_numpart (RFC-7541), an email with a
#: hyphenated domain kept whole, a url with a query string (entities
#: are NOT decoded inside url tokens — '&amp;' rides along as
#: literal chars), a bare ftp host, the documented numeric
#: file-vs-host ambiguity ('$19.99/mo' -> url '19.99/mo' with host
#: '19.99'), and a file token that swallows its sentence-final
#: period ('/pub/releases/sha256sums.txt.').
WEBTEXT_HTML_8 = """\
<!DOCTYPE html>
<html lang="en">
<head><meta charset="utf-8"><title>Tapir Search v2.4 — Release Notes &amp; Pricing</title></head>
<body>
<h1>Tapir Search 2.4.1 release notes</h1>
<ul>
<li>Indexer throughput up 37.5% vs v2.3 (benchmarked 2026-08-18).</li>
<li>Fixed overflow in block-max skip at k=10, eps 1.5e-9.</li>
<li>New wire codec (see RFC-7541); dictionary gzip level -3.</li>
</ul>
<h2>Pricing</h2>
<table>
<tr><td>Starter</td><td>$19.99/mo</td><td>1 node</td></tr>
<tr><td>Team</td><td>$249.00/mo</td><td>8 nodes</td></tr>
</table>
<p>Order desk: sales@tapir-search.example.com or +1-800-555-0199.
Mirrors: https://get.tapir.example.com/dl?ver=2.4.1&amp;arch=x86_64
and ftp.tapir.example.org. Checksums in /pub/releases/sha256sums.txt.
Licensed per RFC; Avogadro-scale corpora (6.02e23 docs) not supported.</p>
</body>
</html>
"""
