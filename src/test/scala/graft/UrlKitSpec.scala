package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.url.{UrlKit, UrlTypes}

/** Golden truth tables transcribed from the reference URL suite
  * (reference: tests/unit/test_urllocation.py). */
class UrlKitSpec extends AnyFunSuite {

  // --- mainstream / youtube / analytics / link service (…:27-109)
  test("is_mainstream") {
    assert(UrlKit.isMainstream("http://www.youtube.com/test"))
    assert(UrlKit.isMainstream("http://youtube.com/watch?v=1234"))
    assert(UrlKit.isMainstream("http://youtu.be/djjdj"))
    assert(UrlKit.isMainstream("http://www.m.youtube.com/watch?v=1235"))
    assert(UrlKit.isMainstream("http://twitter.com/test"))
    assert(UrlKit.isMainstream("http://www.facebook.com/test"))
    assert(UrlKit.isMainstream("http://www.rumble.com/test"))
    assert(UrlKit.isMainstream("http://wikipedia.org/test"))
    assert(!UrlKit.isMainstream("http://test.com/my-site-test"))
  }

  test("is_youtube") {
    assert(UrlKit.isYoutube("http://www.youtube.com/test"))
    assert(UrlKit.isYoutube("http://youtube.com/?v=1234"))
    assert(UrlKit.isYoutube("http://youtu.be/djjdj"))
    assert(UrlKit.isYoutube("http://www.m.youtube.com/?v=1235"))
    assert(!UrlKit.isYoutube("http://twitter.com/test"))
    assert(!UrlKit.isYoutube("http://www.not-youtube.com/test"))
  }

  test("is_analytics") {
    assert(UrlKit.isAnalytics("http://g.doubleclick.net/test"))
    assert(!UrlKit.isAnalytics("http://test.com/my-site-test"))
  }

  test("is_link_service") {
    assert(UrlKit.isLinkService("http://lmg.gg/test"))
    assert(!UrlKit.isLinkService("http://lmg-not.gg/test"))
  }

  // --- get_domain (…:111-195)
  test("get_domain") {
    assert(UrlKit.domainFull("http://test.com/my-site-test").contains("http://test.com"))
    assert(UrlKit.domainFull("http://127.0.0.1/my-site-test").contains("http://127.0.0.1"))
    assert(UrlKit.domainFull("ftp://test.com/my-site-test").contains("ftp://test.com"))
    assert(UrlKit.domainFull("smb://test.com/my-site-test").contains("smb://test.com"))
    assert(UrlKit.domainFull("//test.com/my-site-test").contains("//test.com"))
    assert(UrlKit.domainFull("\\\\test.com\\my-site-test").contains("\\\\test.com"))
    assert(UrlKit.domainFull(null).isEmpty)
    val onion = "http://dreadytofatroptsdj6io7l3xptbet6onoyno2yv7jicoxknyazubrad.onion"
    assert(UrlKit.domainFull(onion).contains(onion))
    assert(UrlKit.domainFull("https://user@gmail.com").contains("https://gmail.com"))
    assert(UrlKit.domainFull(
      "https://web.archive.org/web/20000229222350/http://www.quantumpicture.com/Flo_Control/flo_control.htm")
      .contains("https://web.archive.org"))
    assert(UrlKit.domainFull(
      "https://www.cell.com/cell/fulltext/S0092-8674(23)01344-2?_returnURL=https%3A%2F%2Flinkinghub.elsevier.com%2Fretrieve%2Fpii%2FS0092867423013442%3Fshowall%3Dtrue")
      .contains("https://www.cell.com"))
    assert(UrlKit.domainFull("test.com").contains("https://test.com"))
    assert(UrlKit.domainFull("HTTPS://test.com").contains("https://test.com"))
    assert(UrlKit.domainFull("https://my-server:8185/view/somethingsomething")
      .contains("https://my-server"))
    assert(UrlKit.domainFull(
      "https://odysee.com/@MetalRockRules!:1/Metallica---The-Memory-Remains--Music-Video-HD-Remastered-:6")
      .contains("https://odysee.com"))
    assert(UrlKit.domainFull("http://www.m.youtube.com/watch?v=1235", noWww = true)
      .contains("http://m.youtube.com"))
  }

  test("get_domain_only") {
    assert(UrlKit.domainOnly("http://test.com/my-site-test").contains("test.com"))
    val onion = "http://dreadytofatroptsdj6io7l3xptbet6onoyno2yv7jicoxknyazubrad.onion"
    assert(UrlKit.domainOnly(onion)
      .contains("dreadytofatroptsdj6io7l3xptbet6onoyno2yv7jicoxknyazubrad.onion"))
    assert(UrlKit.domainOnly("http://www.m.youtube.com/watch?v=1235", noWww = true)
      .contains("m.youtube.com"))
    assert(UrlKit.domainOnly("192.168.0.168").contains("192.168.0.168"))
    assert(UrlKit.domainOnly("//192.168.0.168").contains("192.168.0.168"))
    assert(UrlKit.domainOnly("192.168.0.168/location").contains("192.168.0.168"))
    assert(UrlKit.domainOnly("//192.168.0.168/location").contains("192.168.0.168"))
  }

  test("is_domain") {
    assert(!UrlKit.isDomain(
      "https://web.archive.org/web/20000229222350/http://www.quantumpicture.com/Flo_Control/flo_control.htm"))
    assert(!UrlKit.isDomain(
      "https://www.cell.com/cell/fulltext/S0092-8674(23)01344-2?_returnURL=https%3A%2F%2Flinkinghub.elsevier.com%2Fretrieve%2Fpii%2FS0092867423013442%3Fshowall%3Dtrue"))
    assert(UrlKit.isDomain("http://test.com"))
    assert(UrlKit.isDomain("test.com"))
    assert(!UrlKit.isDomain("http://test.com/page"))
  }

  // --- page ext (…:246-279)
  test("get_page_ext") {
    assert(UrlKit.pageExt("http://mytestpage.com/page.html").contains("html"))
    assert(UrlKit.pageExt("http://mytestpage.com/page.htm").contains("htm"))
    assert(UrlKit.pageExt("http://mytestpage.com/page.js").contains("js"))
    assert(UrlKit.pageExt("http://mytestpage.com").isEmpty)
    assert(UrlKit.pageExt("http://mytestpage.com/page.html?args=some").contains("html"))
  }

  // --- get_url_for_domain (…:281-338)
  test("resolve") {
    assert(UrlKit.resolve("http://mytestpage.com/test/", "images/facebook.com")
      == "http://mytestpage.com/test/images/facebook.com")
    assert(UrlKit.resolve("http://mytestpage.com/test", "images/facebook.com")
      == "http://mytestpage.com/test/images/facebook.com")
    assert(UrlKit.resolve("http://mytestpage.com/test/", "/images/facebook.com")
      == "http://mytestpage.com/images/facebook.com")
    assert(UrlKit.resolve("http://mytestpage.com/test/", "//images/facebook.com")
      == "https://images/facebook.com")
    assert(UrlKit.resolve("http://mytestpage.com/test/", "http://images/facebook.com")
      == "http://images/facebook.com")
    assert(UrlKit.resolve("http://mytestpage.com/test/", "https://images/facebook.com")
      == "https://images/facebook.com")
  }

  // --- up (…:340-372)
  test("up") {
    assert(UrlKit.up("http://www.youtube.com/test1/test2?arg=1")
      .contains("http://www.youtube.com/test1"))
    assert(UrlKit.up("http://www.youtube.com/test1/test2")
      .contains("http://www.youtube.com/test1"))
    assert(UrlKit.up("http://www.youtube.com/test1")
      .contains("http://www.youtube.com"))
    assert(UrlKit.up("http://www.youtube.com").contains("http://youtube.com"))
    assert(UrlKit.up("http://youtube.com").isEmpty)
  }

  // --- split / join / parse (…:374-475)
  test("split") {
    val parts = UrlKit.split("http://www.youtube.com/test1/test2?whatever=1&something=2")
    assert(parts == Vector("http", "://", "www.youtube.com", "test1", "test2",
      "?whatever=1&something=2"))
  }

  test("join") {
    assert(UrlKit.join(Seq("http", "://", "www.youtube.com", "test1", "test2",
      "?whatever=1&something=2"))
      == "http://www.youtube.com/test1/test2?whatever=1&something=2")
  }

  test("parse_url") {
    assert(UrlKit.parseUrl("https://www.youtube.com/test?parameter=True").get
      == Vector("https", "://", "www.youtube.com", "/test", "?parameter=True"))
    assert(UrlKit.parseUrl("https://www.youtube.com/test#parameter=True").get
      == Vector("https", "://", "www.youtube.com", "/test", "#parameter=True"))
    assert(UrlKit.parseUrl("https://www.youtube.com/test/").get
      == Vector("https", "://", "www.youtube.com", "/test/"))
    assert(UrlKit.parseUrl("https://www.youtube.com:443/test?parameter=True").get
      == Vector("https", "://", "www.youtube.com:443", "/test", "?parameter=True"))
    assert(UrlKit.parseUrl("something.com").get
      == Vector("https", "://", "something.com", ""))
    assert(UrlKit.parseUrl("something.onion").get
      == Vector("http", "://", "something.onion", ""))
  }

  // --- is_web_link (…:477-536)
  test("is_web_link") {
    assert(UrlKit.isWebLink("https://www.youtube.com"))
    assert(UrlKit.isWebLink("https://youtube.com"))
    assert(UrlKit.isWebLink("https://youtube.com/"))
    assert(UrlKit.isWebLink("https://test6.domain.com/"))
    assert(UrlKit.isWebLink("smb://youtube.com"))
    assert(UrlKit.isWebLink("ftp://youtube.com"))
    assert(UrlKit.isWebLink("//127.0.0.1"))
    assert(UrlKit.isWebLink("\\\\127.0.0.1"))
    assert(!UrlKit.isWebLink(
      "http://&up_bodycolor=627c4f&up_pattern=0&up_patterncolor=000000&up_footcolor=2ba029&up_eyecolor=2ba029&up_bellysize=.5&up_backg"))
    assert(!UrlKit.isWebLink("https://com"))
    assert(!UrlKit.isWebLink("http://domain&char.com"))
    assert(!UrlKit.isWebLink("https://.com"))
    assert(!UrlKit.isWebLink("https://something.html"))
    assert(!UrlKit.isWebLink("https://something.more.difficult.html"))
    assert(!UrlKit.isWebLink("https://something"))
  }

  // --- protocol helpers (…:538-566)
  test("protocol helpers") {
    assert(UrlKit.protocolless("https://www.youtube.com:443") == "www.youtube.com:443")
    assert(UrlKit.protocolless("https://www.youtube.com:443/test") == "www.youtube.com:443/test")
    assert(UrlKit.protocolUrl("https://www.youtube.com:443", "http") == "http://www.youtube.com:443")
    assert(UrlKit.protocolUrl("https://www.youtube.com:443", "ftp") == "ftp://www.youtube.com:443")
    assert(UrlKit.port("https://www.youtube.com:443/test?parameter=True").contains(443))
    assert(UrlKit.port("https://www.youtube.com:443").contains(443))
  }

  // --- robots (…:568-589)
  test("robots txt url") {
    assert(UrlKit.robotsTxtUrl("https://www.youtube.com")
      .contains("https://www.youtube.com/robots.txt"))
    assert(UrlKit.robotsTxtUrl(
      "http://dreadytofatroptsdj6io7l3xptbet6onoyno2yv7jicoxknyazubrad.onion").isEmpty)
    assert(UrlKit.robotsTxtUrl("https://www.youtube.com:43")
      .contains("https://www.youtube.com/robots.txt"))
  }

  // --- cleaned link (…:591-699)
  test("get_cleaned_link") {
    val onion = "http://dreadytofatroptsdj6io7l3xptbet6onoyno2yv7jicoxknyazubrad.onion"
    assert(UrlKit.cleanedLink(onion).contains(onion))
    assert(UrlKit.cleanedLink(
      "https://www.google.com/url?q=https://forum.ddopl.com/&sa=Udupa")
      .contains("https://forum.ddopl.com"))
    assert(UrlKit.cleanedLink(
      "https://www.google.com/url?sa=t&source=web&rct=j&opi=89978449&url=https://worldofwarcraft.blizzard.com/&ved=2ahUKEwjtx56Pn5WFAxU2DhAIHYR1CckQFnoECCkQAQ&usg=AOvVaw1pDkx5K7B5loKccvg_079-")
      .contains("https://worldofwarcraft.blizzard.com"))
    assert(UrlKit.cleanedLink(
      "https://www.google.com/amp/s/www.muycomputer.com/2025/09/30/f-droid-y-google-adios-a-las-tiendas-de-apps-alternativas/amp/")
      .contains("https://www.muycomputer.com/2025/09/30/f-droid-y-google-adios-a-las-tiendas-de-apps-alternativas/amp"))
    assert(UrlKit.cleanedLink(
      "https://www.youtube.com/redirect?event=lorum&redir_token=ipsum&q=https%3A%2F%2Fcorridordigital.com%2F&v=LeB9DcFT810")
      .contains("https://corridordigital.com"))
    assert(UrlKit.cleanedLink(
      "https://www.linkedin.com/safety/go?url=https%3A%2F%2Fgzeek.pl")
      .contains("https://gzeek.pl"))
    assert(UrlKit.cleanedLink(
      "https://www.bing.com/ck/a?!&&p=fbfe7ffb67f6f6c34824ac525fe2fb725b91642179e68033951505fc2c6626e8JmltdHM9MTc3NTAwMTYwMA&ptn=3&ver=2&hsh=4&fclid=1d72276f-50a1-6945-23cf-31135189683e&psq=slap+mac&u=a1aHR0cHM6Ly9zbGFwbWFjLmNvbS8")
      .contains("https://slapmac.com"))
    val ytFeed = "https://www.youtube.com/feeds/videos.xml?channel_id=UCxHcoI9ndIdAihEB7ODTOfQ"
    assert(UrlKit.cleanedLink(ytFeed).contains(ytFeed))
    val ytRedirNoQ = "https://www.youtube.com/redirect?event=lorum&redir_token=ipsum"
    assert(UrlKit.cleanedLink(ytRedirNoQ).contains(ytRedirNoQ))
    assert(UrlKit.cleanedLink("?").contains("?"))
  }

  test("get_url_arg") {
    assert(UrlKit.urlArg("https://www.linkedin.com/safety/go?url=https%3A%2F%2Fgzeek.pl")
      .contains("https://gzeek.pl"))
  }

  // --- is_onion (…:712-732)
  test("is_onion") {
    assert(UrlKit.isOnion("http://dreadytofatroptsdj6io7l3xptbet6onoyno2yv7jicoxknyazubrad.onion"))
    assert(UrlKit.isOnion("https://dreadytofatroptsdj6io7l3xptbet6onoyno2yv7jicoxknyazubrad.onion"))
    assert(UrlKit.isOnion("https://www.dreadytofatroptsdj6io7l3xptbet6onoyno2yv7jicoxknyazubrad.onion"))
    assert(!UrlKit.isOnion("http://linkedin.com"))
  }

  // --- media classification (…:734-780)
  test("is_binary / is_audio / is_video / is_image") {
    assert(UrlKit.isBinary("http://example.com/location.bin"))
    assert(UrlKit.isBinary("http://example.com/location.iso"))
    assert(UrlKit.isBinary("http://example.com/location.iso?argument=1"))
    assert(UrlKit.isAudio("http://example.com/location.mp3"))
    assert(UrlKit.isAudio("http://example.com/location.ogg"))
    assert(UrlKit.isVideo("http://example.com/location.mp4"))
    assert(UrlKit.isVideo("http://example.com/location.avi"))
    assert(UrlKit.isImage("http://example.com/location.ico"))
    assert(UrlKit.isImage("http://example.com/location.jpg"))
    assert(UrlKit.isImage("http://example.com/location.gif"))
    assert(UrlKit.isImage("http://example.com/location.svg"))
  }

  // --- is_webpage_link (…:782-825)
  test("is_webpage_link") {
    assert(UrlKit.isWebpageLink("http://example.com"))
    assert(UrlKit.isWebpageLink("http://example.com/location"))
    assert(UrlKit.isWebpageLink("https://test6.domain.com/"))
    assert(UrlKit.isWebpageLink("http://example.com/location/"))
    assert(UrlKit.isWebpageLink("http://example.com/location?argument=1"))
    assert(UrlKit.isWebpageLink("http://otherpage1.net"))
    assert(UrlKit.isWebpageLink("http://mytestpage.com/test/test2.html"))
    assert(UrlKit.isWebpageLink("http://mytestpage.com/test/test2.htm"))
    assert(UrlKit.isWebpageLink("http://mytestpage.com/test/test2.php"))
    assert(!UrlKit.isWebpageLink("http://mytestpage.com/test/test2.js"))
    assert(!UrlKit.isWebpageLink("http://mytestpage.com/test/test2.css"))
  }

  // --- is_ip (…:827-866)
  test("is_ip") {
    assert(UrlKit.isIp("192.168.0.1"))
    assert(UrlKit.isIp("//192.168.0.1"))
    assert(UrlKit.isIp("smb://192.168.0.1"))
    assert(UrlKit.isIp("http://192.168.0.1"))
    assert(UrlKit.isIp("192.168.0.1/test/test2.css"))
    assert(UrlKit.isIp("//192.168.0.1/test/test2.css"))
    assert(UrlKit.isIp("http://192.168.0.1/test/test2.css"))
    assert(!UrlKit.isIp("http://example.com/test/test2.css"))
    assert(UrlKit.isIp("http://2001:0db8:85a3:0000:0000:8a2e:0370:7334"))
    assert(UrlKit.isIp("http://2001:0db8:85a3:0000:0000:8a2e:0370:7334/test/test2.css"))
  }

  // --- guess_type (…:877-972)
  test("guess_type") {
    assert(UrlKit.guessType("http://mytestpage.com") == "")
    assert(UrlKit.guessType("http://mytestpage.com/location") == "")
    assert(UrlKit.guessType("http://mytestpage.com/test/test2.html") == "text/html")
    assert(UrlKit.guessType("http://mytestpage.com/file.xml") == "application/xml")
    assert(UrlKit.guessType("http://mytestpage.com/rss.xml") == "application/xml")
    assert(UrlKit.guessType("http://mytestpage.com/feeds") == "")
    assert(UrlKit.guessType("http://mytestpage.com/script.js") == "text/javascript")
    assert(UrlKit.guessType("http://mytestpage.com/script.css") == "text/css")
    assert(UrlKit.guessType("http://mytestpage.com/script.php") == "")
    assert(UrlKit.guessType("http://mytestpage.com/script.aspx") == "")
    assert(UrlKit.guessType("http://mytestpage.com/script.tff") == "")
    assert(UrlKit.guessType("http://mytestpage.com/file.mp3") == "audio/mpeg")
    assert(UrlKit.guessType("http://mytestpage.com/file.mp4") == "video/mp4")
    assert(UrlKit.guessType("http://mytestpage.com/file.avi") == "video/x-msvideo")
    assert(UrlKit.guessType("http://mytestpage.com/file.mobi") == "")
    assert(UrlKit.guessType("http://mytestpage.com/file.zip") == "application/zip")
    assert(UrlKit.guessType("http://mytestpage.com/file.iso") == "application/x-iso9660-image")
    assert(UrlKit.guessType("http://mytestpage.com/file.md") == "text/markdown")
  }

  // --- get_type (…:974-1062)
  test("get_type") {
    assert(UrlKit.getType("http://mytestpage.com") == UrlTypes.Html)
    assert(UrlKit.getType("http://mytestpage.com/location") == UrlTypes.Html)
    assert(UrlKit.getType("http://mytestpage.com/test/test2.html") == UrlTypes.Html)
    assert(UrlKit.getType("http://mytestpage.com/file.xml") == UrlTypes.Unknown)
    assert(UrlKit.getType("http://mytestpage.com/rss.xml") == UrlTypes.Unknown)
    assert(UrlKit.getType("http://mytestpage.com/feeds") == UrlTypes.Html)
    assert(UrlKit.getType("http://mytestpage.com/script.js") == UrlTypes.Javascript)
    assert(UrlKit.getType("http://mytestpage.com/script.css") == UrlTypes.Css)
    assert(UrlKit.getType("http://mytestpage.com/script.php") == UrlTypes.Html)
    assert(UrlKit.getType("http://mytestpage.com/script.aspx") == UrlTypes.Html)
    assert(UrlKit.getType("http://mytestpage.com/script.tff") == UrlTypes.Font)
    assert(UrlKit.getType("http://mytestpage.com/file.mp3") == UrlTypes.File)
    assert(UrlKit.getType("http://mytestpage.com/file.mp4") == UrlTypes.File)
    assert(UrlKit.getType("http://mytestpage.com/file.avi") == UrlTypes.File)
    assert(UrlKit.getType("http://mytestpage.com/file.mobi") == UrlTypes.File)
    assert(UrlKit.getType("http://mytestpage.com/file.zip") == UrlTypes.File)
    assert(UrlKit.getType("http://mytestpage.com/file.iso") == UrlTypes.File)
    assert(UrlKit.getType("http://mytestpage.com/file.md") == UrlTypes.Unknown)
  }

  // --- no-arg link (…:1064-1087)
  test("get_no_arg_link") {
    assert(UrlKit.noArgLink("http://mytestpage.com/file.md").contains("http://mytestpage.com/file.md"))
    assert(UrlKit.noArgLink("http://mytestpage.com/file.md?argument=test").contains("http://mytestpage.com/file.md"))
    assert(UrlKit.noArgLink("http://mytestpage.com/file.md#section").contains("http://mytestpage.com/file.md"))
    assert(UrlKit.noArgLink("http://mytestpage.com").contains("http://mytestpage.com"))
    assert(UrlKit.noArgLink("http://mytestpage.com?test=something").contains("http://mytestpage.com"))
    assert(UrlKit.noArgLink("http://mytestpage.com#test=something").contains("http://mytestpage.com"))
  }
}
